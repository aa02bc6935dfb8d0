"""Autoregressive generation with a static KV cache + chat API.

Replaces the reference generation stack: ``InternLM2ForCausalLM.generate`` /
``chat``/``stream_chat`` (``modeling_internlm2.py:988-1292``) and
``InternVLChatModel.chat``/``batch_chat``/``generate``
(``modeling_internvl_chat.py:264-415``).  TPU-first:

* Static shapes everywhere: the KV cache is a preallocated (L, B, max_len,
  Hkv, D) buffer; the decode loop is ``lax.while_loop`` with an early-exit
  predicate on EOS — one compiled program per (prompt bucket, max_len).
* Prefill = one full forward (same code path as scoring); decode steps are
  single-token forwards that dynamic-update-slice into the cache.
* Position ids come from the attention mask cumsum, so left- or right-padded
  batches both decode correctly (the reference relies on HF's unpadding).
* Sampling: greedy, temperature, and nucleus (top-p) — the reference uses HF
  ``do_sample`` defaults (``criteria_train.py:61``).
"""

from __future__ import annotations

import functools
import os

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import ChatConfig, LLMConfig
from ..ops.attention import attention_xla
from ..ops.norms import rms_norm
from ..ops.quant import dequantize_kv, quantize_kv
from ..ops.rope import apply_rope, rope_tables
from . import decoder as dec
from .internvl import extract_feature, scatter_image_embeds

# Cauchy-Schwarz softmax bound in the CACHED prefill paths (empty-cache
# prompt prefill + prefix-cache suffix continuation), in its row-causal
# variant: each q row's bound is the running key-norm max over positions
# <= its own global slot — a pure function of the tokens before it, so a
# prefix-only prefill and a full-prompt prefill compute IDENTICAL bounds
# for shared rows BY CONSTRUCTION (``_fwd_bound_kernel`` row_bound), with
# no greedy-tie hazard (the reason the GLOBAL-kmax variant stays out of
# these paths, models/decoder.py:42).
#
# OFF BY DEFAULT — measured negative result (VERDICT r4 item 4, round-5
# on-chip A/B in benchmarks/llm_bound_ab.py): the per-row kmax VMEM block
# and per-row bound math eat most of the collapsed-softmax win — +1.7% at
# the B1 prefill shape (below the pre-registered 2% adoption bar) and
# -3.6% at the ragged B4 shape that pair-batched judge prefills (B=2,
# mixed lengths) resemble, vs the global bound's +5.6%/+6.2% on the same
# shapes.  The mechanism stays correctness-tested (XLA parity under GQA +
# ragged padding + per-row q_offset, bit-identical prefix rows —
# tests/test_flash_attention.py); MJV_CACHE_NORM_BOUND=1 opts in.
_CACHE_BOUND = ("rows" if os.environ.get("MJV_CACHE_NORM_BOUND", "0") == "1"
                else False)


class KVCache(NamedTuple):
    """Static KV cache; optionally int8-quantized (``kv_quant``).

    Dense: ``k``/``v`` (L, B, max_len, Hkv, D) bf16, scales ``None``.
    Quantized: ``k``/``v`` int8 with per-(slot, head) fp32 ``k_scale``/
    ``v_scale`` (L, B, max_len, Hkv) — halves cache HBM vs bf16, which is
    what bounds long-video judge decode (an InternVL2-26B judge's 26k-token
    bf16 cache alone is ~5 GB; see docs/PERF.md).  The reference has no
    quantized cache (HF ``past_key_values`` are model-dtype tuples,
    ``modeling_internlm2.py:988-1052``) — this is capability on top.
    """

    k: jnp.ndarray  # (L, B, max_len, Hkv, D)
    v: jnp.ndarray  # (L, B, max_len, Hkv, D)
    k_scale: Optional[jnp.ndarray] = None  # (L, B, max_len, Hkv) if int8
    v_scale: Optional[jnp.ndarray] = None


def init_kv_cache(cfg: LLMConfig, batch: int, max_len: int,
                  dtype=jnp.bfloat16, quant: bool = False) -> KVCache:
    shape = (cfg.num_hidden_layers, batch, max_len,
             cfg.num_key_value_heads, cfg.head_dim)
    if quant:
        return KVCache(jnp.zeros(shape, jnp.int8),
                       jnp.zeros(shape, jnp.int8),
                       jnp.zeros(shape[:-1], jnp.float32),
                       jnp.zeros(shape[:-1], jnp.float32))
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def scatter_kv(k_cache, v_cache, k_scale, v_scale, k, v,
               position_ids, cache_mask):
    """Write new K/V (B, S, Hkv, D) into their cache slots.

    ``position_ids`` are the slots.  Writes are masked by the slot's
    validity so pad tokens never land in the cache — decode can then
    safely reuse a right-padded prompt's pad slots (the scatter is
    additive; an unmasked pad write would corrupt).  When the cache is
    int8 (``k_scale is not None``) the fresh vectors quantize per
    (slot, head) first; masked int8 values add exactly, and each slot
    is written at most once per call so the int8 add cannot overflow.

    Implementation: an indexed ``.at[rows, slots].add`` scatter, NOT a
    one-hot einsum — the einsum costs O(S * max_len * Hkv * D) FLOPs
    and materializes a full new cache buffer on EVERY call (for decode,
    ~3x the cache's HBM traffic per layer per step: read + write the
    whole cache for the add, read again for attention).  XLA lowers the
    scatter onto the loop-carried cache buffer in place, so only the
    written rows move.  Additive semantics are preserved exactly:
    indices within a call are unique (prefill slots are distinct,
    decode writes one fresh slot per row).

    Returns the updated cache arrays plus ``write_ok`` (B, S) — each new
    token's slot validity — so callers' attention masks use the exact
    mask the write used.
    """
    write_ok = jnp.take_along_axis(cache_mask, position_ids, axis=1)  # (B, S)
    rows = jnp.arange(k_cache.shape[0])[:, None]  # (B, 1) -> bcast (B, S)
    quant = k_scale is not None
    if quant:
        kq, ks = quantize_kv(k)
        vq, vs = quantize_kv(v)
        ok8 = write_ok[:, :, None].astype(jnp.int8)
        k_cache = k_cache.at[rows, position_ids].add(kq * ok8[..., None])
        v_cache = v_cache.at[rows, position_ids].add(vq * ok8[..., None])
        okf = write_ok.astype(jnp.float32)[:, :, None]
        k_scale = k_scale.at[rows, position_ids].add(ks * okf)
        v_scale = v_scale.at[rows, position_ids].add(vs * okf)
    else:
        ok = write_ok[:, :, None, None].astype(k_cache.dtype)
        k_cache = k_cache.at[rows, position_ids].add(
            k.astype(k_cache.dtype) * ok)
        v_cache = v_cache.at[rows, position_ids].add(
            v.astype(v_cache.dtype) * ok)
    return k_cache, v_cache, k_scale, v_scale, write_ok


def read_kv(k_cache, v_cache, k_scale, v_scale, dtype):
    """Cache slices as attention operands; int8 caches dequantize here
    (the convert + scale multiply fuse into the matmul's operand read)."""
    if k_scale is None:
        return k_cache.astype(dtype), v_cache.astype(dtype)
    return (dequantize_kv(k_cache, k_scale, dtype),
            dequantize_kv(v_cache, v_scale, dtype))


def _layer_with_cache(cfg: LLMConfig, lp, x, k_cache, v_cache, k_scale,
                      v_scale, cos, sin, position_ids, cache_mask,
                      attn_impl: str = "xla", q_offset=None):
    """One decoder layer writing its fresh K/V into the cache slice.

    ``x``: (B, S, C) new tokens; ``k_cache``/``v_cache``: (B, max_len, Hkv, D)
    with the first ``offset`` slots filled; ``cache_mask``: (B, max_len)
    1 = valid cache slot (includes the new tokens' slots);
    ``k_scale``/``v_scale``: (B, max_len, Hkv) int8-cache scales or None.

    ``attn_impl``: prefill attention backend.  Any value other than
    ``"xla"`` routes multi-token calls (S > 1) through
    ``multi_head_attention`` over the FRESH tokens only — the Pallas
    flash kernel on TPU (measured 2.5x XLA at judge prefill shapes,
    docs/PERF.md), and without the (B, S, max_len) bias the XLA path
    materializes.  That is only correct when the cache is EMPTY before
    the call, which holds for every prefill in this package (prompts
    always prefill into a fresh cache; prefill slots are sequence
    order, so flash's causal-over-index equals the slot-causality
    test).  A caller extending a NON-empty cache by multiple tokens
    (prefix-cache suffix continuation) passes ``q_offset`` = per-row
    global position of its first fresh token: the flash kernel then runs
    over the WHOLE cache with slot-index causality (``q_pos = q_offset +
    i >= k_slot``), which — because suffix slots are contiguous after the
    prefix — is numerically the SAME kernel, iterating kv blocks from
    slot 0 exactly as a full-prompt flash prefill does (extra all-masked
    tail blocks are exact no-ops in the online softmax), so prefix
    caching can no longer flip a greedy tie against the full-prompt path
    via kernel choice (docs/PARITY.md prefix-caching caveat, VERDICT r3
    next-5).  Without ``q_offset``, non-"xla" multi-token calls keep the
    empty-cache contract; ``attn_impl="xla"`` keeps the windowed bias
    path.  Single-token decode (S == 1) always reads the cache.
    """
    B, S, C = x.shape
    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    h = rms_norm(x, lp["attention_norm"]["weight"], eps=cfg.rms_norm_eps)
    q = dec._dense(lp["attention"]["wq"], h).reshape(B, S, Hq, D)
    k = dec._dense(lp["attention"]["wk"], h).reshape(B, S, Hkv, D)
    v = dec._dense(lp["attention"]["wv"], h).reshape(B, S, Hkv, D)
    # Pre-gathered (B, S, D) cos/sin (the M-RoPE rope_override path) go
    # through apply_rope's 3D branch; 2D tables gather by the cache slot.
    q, k = apply_rope(q, k, cos, sin, position_ids if cos.ndim == 2 else None)

    k_cache, v_cache, k_scale, v_scale, write_ok = scatter_kv(
        k_cache, v_cache, k_scale, v_scale, k, v, position_ids, cache_mask)

    cont_flash = S > 1 and q_offset is not None and (
        attn_impl == "flash"
        or (attn_impl == "auto" and jax.default_backend() == "tpu"))
    if cont_flash:
        # Suffix continuation over a NON-empty cache through the same
        # flash kernel as full-prompt prefill (see docstring): q rows sit
        # at slots q_offset + i, kv = the whole cache masked to valid
        # slots.  In practice the kernel's kv blocking also coincides with
        # the full-prompt prefill's (both saturate at block_kv=1024 for
        # judge shapes), making the suffix logits bit-equal, not merely
        # same-kernel.  ("auto" takes this path only on TPU — interpreted
        # flash off-TPU would be strictly slower than the windowed bias.)
        from ..ops.flash_attention import flash_attention

        k_op, v_op = read_kv(k_cache, v_cache, k_scale, v_scale, q.dtype)
        attn = flash_attention(q, k_op, v_op, attention_mask=cache_mask,
                               causal=True, q_offset=q_offset,
                               norm_bound=_CACHE_BOUND)
    elif S > 1 and attn_impl != "xla" and q_offset is None:
        # Empty-cache prefill: causal flash over the fresh tokens, pad
        # tokens masked out of kv (their q rows are garbage in both
        # paths and never read — last_real_token / EOS slotting).
        from ..ops.attention import multi_head_attention

        attn = multi_head_attention(q, k, v, attention_mask=write_ok,
                                    causal=True, impl=attn_impl,
                                    norm_bound=_CACHE_BOUND)
    else:
        # Attend over the whole cache, masked to valid slots + causality.
        q_pos = position_ids  # (B, S)
        k_pos = jnp.arange(k_cache.shape[1])[None, :]  # (1, max_len)
        causal = q_pos[:, :, None] >= k_pos[:, None, :]  # (B, S, max_len)
        valid = causal & (cache_mask[:, None, :] != 0)
        bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)[:, None]
        k_op, v_op = read_kv(k_cache, v_cache, k_scale, v_scale, q.dtype)
        attn = attention_xla(q, k_op, v_op, bias=bias)
    x = x + dec._dense(lp["attention"]["wo"], attn.reshape(B, S, Hq * D))

    h = rms_norm(x, lp["ffn_norm"]["weight"], eps=cfg.rms_norm_eps)
    gate = dec._dense(lp["feed_forward"]["w1"], h)
    up = dec._dense(lp["feed_forward"]["w3"], h)
    h = dec._dense(lp["feed_forward"]["w2"], jax.nn.silu(gate) * up)
    return x + h, k_cache, v_cache, k_scale, v_scale


def decoder_forward_cached(
    params, cfg: LLMConfig,
    inputs_embeds: jnp.ndarray,  # (B, S, C)
    cache: KVCache,
    position_ids: jnp.ndarray,  # (B, S) slot indices of the new tokens
    cache_mask: jnp.ndarray,  # (B, max_len) valid-slot mask incl. new tokens
    rope_override=None,  # (cos, sin) pre-gathered (B, S, D) for new tokens
    attn_impl: str = "xla",  # prefill backend; see _layer_with_cache
    q_offset=None,  # (B,) first fresh token's global slot (suffix cont.)
) -> Tuple[jnp.ndarray, KVCache]:
    """Run all layers over new tokens, reading+writing the cache.

    ``rope_override`` serves M-RoPE-style models (Qwen2-VL) that
    precompute per-token cos/sin.  (Models whose rotation position
    differs from the cache slot — CogVLM2's shared vision positions —
    carry their own cached expert layer in ``models/cogvlm2.py``.)

    ``attn_impl != "xla"`` runs multi-token prefill attention over the
    fresh tokens only (flash kernel on TPU) — valid because prompts
    always prefill into an EMPTY cache.  Extending a NON-empty cache
    (suffix continuation) additionally passes ``q_offset``, routing the
    attention through the flash kernel over the whole cache instead; see
    ``_layer_with_cache``.
    """
    max_len = cache.k.shape[2]
    if rope_override is not None:
        cos, sin = rope_override
    else:
        cos, sin = rope_tables(
            max_len, cfg.head_dim, base=cfg.rope_theta,
            scaling_type=cfg.rope_scaling_type,
            scaling_factor=cfg.rope_scaling_factor,
            max_position_embeddings=cfg.max_position_embeddings,
        )

    def block(x, scanned):
        lp, kc, vc, ks, vs = scanned
        x, kc, vc, ks, vs = _layer_with_cache(
            cfg, lp, x, kc, vc, ks, vs, cos, sin, position_ids, cache_mask,
            attn_impl=attn_impl, q_offset=q_offset,
        )
        return x, (kc, vc, ks, vs)

    x, (k_new, v_new, ks_new, vs_new) = jax.lax.scan(
        block, inputs_embeds,
        (params["layers"], cache.k, cache.v, cache.k_scale, cache.v_scale)
    )
    x = rms_norm(x, params["norm"]["weight"], eps=cfg.rms_norm_eps)
    return x, KVCache(k_new, v_new, ks_new, vs_new)


def greedy_decode_batch(step_fn, params, logits0, cache,
                        max_new_tokens: int, eos: int):
    """Traceable batched greedy loop — call INSIDE an outer jit.

    ``step_fn(params, tok (B,) i32, i (scalar i32), cache) ->
    (logits (B, V), cache)`` is the caller's cached step over one new
    token per row.  Runs the whole decode as one ``lax.while_loop`` with
    device-side early exit once EVERY row has emitted ``eos``; finished
    rows keep feeding ``eos`` (their cache writes land on slots the
    output ignores).  Returns (toks (B, max_new_tokens) i32,
    count (B,) i32 = tokens emitted per row including the eos)."""
    B = logits0.shape[0]
    toks0 = jnp.full((B, max_new_tokens), eos, jnp.int32)

    def cond(st):
        i, done, *_ = st
        return jnp.logical_and(~jnp.all(done), i < max_new_tokens)

    def body(st):
        i, done, n, logits, cache, toks = st
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        tok = jnp.where(done, eos, tok)
        toks = toks.at[:, i].set(tok)
        n = n + (~done).astype(jnp.int32)
        done = done | (tok == eos)
        # Skip the decode forward when this token ends the generation
        # everywhere (all-EOS or the last slot) — its logits would never
        # be consumed.
        logits, cache = jax.lax.cond(
            jnp.logical_or(jnp.all(done), i + 1 >= max_new_tokens),
            lambda _: (logits, cache),
            lambda _: step_fn(params, tok, i, cache),
            None,
        )
        return (i + 1, done, n, logits, cache, toks)

    _, _, n, _, _, toks = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros((B,), bool),
                     jnp.zeros((B,), jnp.int32), logits0, cache, toks0))
    return toks, n


def greedy_decode(step_fn, params, logits0, cache, max_new_tokens: int,
                  eos: int):
    """B=1 greedy loop (see ``greedy_decode_batch``): ``step_fn`` takes a
    SCALAR token; returns (toks (max_new_tokens,) i32, count)."""
    toks, n = greedy_decode_batch(
        lambda p, tok, i, c: step_fn(p, tok[0], i, c),
        params, logits0, cache, max_new_tokens, eos)
    return toks[0], n[0]


def round_up_bucket(n: int, bucket: int = 64) -> int:
    """Prompt-length bucketing: judges see a different caption every call;
    rounding the prompt up to a bucket keeps ONE compiled generate
    executable per (bucket, max_new_tokens) instead of one per caption."""
    return (n + bucket - 1) // bucket * bucket


# Shared scaffolding for the judge-backbone cached-generate factories
# (qwen2vl / minicpmv / cogvlm2): right-padded prompt at slots [0, n_real),
# decode token i at slot n_real + i.  Keeping the slot/mask arithmetic in
# one place stops the three factories from drifting apart.

def pad_prompt_batch(ids_list, pad_id: int, bucket: int = 64):
    """[(1, T_i) prompts] -> ((B, Tb) right-padded ids, (B,) n_real, Tb)
    with every row bucketed to the same width."""
    n_real = np.asarray([ids.shape[1] for ids in ids_list], np.int32)
    Tb = round_up_bucket(int(n_real.max()), bucket)
    out = np.full((len(ids_list), Tb), pad_id, np.int32)
    for b, ids in enumerate(ids_list):
        out[b, : ids.shape[1]] = ids[0]
    return out, n_real, Tb


def _rows(n_real):
    """n_real (scalar or (B,)) -> (B, 1) column vector."""
    return jnp.reshape(jnp.atleast_1d(jnp.asarray(n_real)), (-1, 1))


def prefill_slot_mask(Tb: int, max_len: int, n_real):
    """Cache slots + validity mask for the (padded) prompt prefill.

    ``n_real``: scalar or (B,) per-row real-token counts; returns
    ((B or 1, Tb) slots, (B or 1, max_len) mask)."""
    nr = _rows(n_real)
    slots = jnp.broadcast_to(jnp.arange(Tb)[None], (nr.shape[0], Tb))
    mask = (jnp.arange(max_len)[None] < nr).astype(jnp.int32)
    return slots, mask


def step_slot_mask(max_len: int, n_real, i):
    """Cache slot + validity mask for the i-th generated token (per row)."""
    nr = _rows(n_real)
    slots = (nr + i).astype(jnp.int32)
    mask = (jnp.arange(max_len)[None] < nr + i + 1).astype(jnp.int32)
    return slots, mask


def last_real_token(hidden, n_real):
    """(B, T, C) -> (B, 1, C) at each row's last REAL prompt position."""
    idx = _rows(n_real).astype(jnp.int32)[:, :, None] - 1  # (B, 1, 1)
    idx = jnp.broadcast_to(idx, (hidden.shape[0], 1, 1))
    return jnp.take_along_axis(hidden, idx, axis=1)


class GenerationConfig(NamedTuple):
    max_new_tokens: int = 256
    eos_token_id: int = 2
    temperature: float = 0.0  # 0 = greedy
    top_p: float = 1.0
    top_k: int = 0  # 0 = off; HF do_sample defaults to top_k=50
    pad_token_id: int = 2
    # int8 KV cache (per-slot-per-head scales): halves cache HBM, for
    # long-video judge decode.  Opt-in; accuracy ladder in docs/PERF.md.
    kv_quant: bool = False


def _sample(logits: jnp.ndarray, gc: GenerationConfig, key) -> jnp.ndarray:
    """(B, V) logits -> (B,) token ids."""
    if gc.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / gc.temperature
    if gc.top_k > 0:
        # Keep the k highest logits (HF do_sample default top_k=50);
        # kth value via top_k is O(V log k) and static-shaped.
        kth = jax.lax.top_k(logits, gc.top_k)[0][:, -1:]
        logits = jnp.where(logits < kth, -1e30, logits)
    if gc.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Smallest logit still inside the nucleus.
        k = jnp.sum(cum - probs < gc.top_p, axis=-1) - 1
        cutoff = jnp.take_along_axis(sorted_logits, k[:, None], axis=-1)
        logits = jnp.where(logits < cutoff, -1e30, logits)
    return jax.random.categorical(key, logits, axis=-1)


def generate(
    params,  # chat params (vision_model + mlp1 + language_model w/ lm head)
    cfg: ChatConfig,
    input_ids: jnp.ndarray,  # (B, T) right- or left-padded prompt
    attention_mask: jnp.ndarray,  # (B, T)
    pixel_values: Optional[jnp.ndarray] = None,  # (P, H, W, 3)
    generation_config: GenerationConfig = GenerationConfig(),
    rng: Optional[jax.Array] = None,
    attn_impl: str = "auto",
    vision_embeds: Optional[jnp.ndarray] = None,  # (P, n_tok, C) precomputed
) -> jnp.ndarray:
    """Multimodal autoregressive generation; returns (B, max_new_tokens).

    Equivalent of ``InternVLChatModel.generate``
    (``modeling_internvl_chat.py:369-415``): ViT features scatter into the
    prompt embeds, then the LLM decodes.  ``vision_embeds`` short-circuits
    the vision tower with precomputed ``extract_feature`` output — callers
    asking many questions about the same video encode it once.
    """
    gc = generation_config
    lm = params["language_model"]
    llm_cfg = cfg.llm
    B, T = input_ids.shape
    max_len = T + gc.max_new_tokens
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    embeds = dec.embed_tokens(lm, input_ids)
    if vision_embeds is None and pixel_values is not None:
        vision_embeds = extract_feature(params, cfg, pixel_values,
                                        attn_impl=attn_impl, remat=False)
    if vision_embeds is not None:
        embeds = scatter_image_embeds(
            embeds, input_ids, vision_embeds, cfg.img_context_token_id
        )

    # Cache slots are laid out by sequence index (slot i = token i); RoPE
    # positions ARE the slots — left-padded rows stay correct via the
    # rotation's shift invariance, and pad slots never enter the cache.
    slot_ids = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    cache = init_kv_cache(llm_cfg, B, max_len, dtype=embeds.dtype,
                          quant=gc.kv_quant)
    cache_mask0 = jnp.pad(attention_mask, ((0, 0), (0, gc.max_new_tokens)))

    hidden, cache = decoder_forward_cached(
        lm, llm_cfg, embeds, cache, slot_ids, cache_mask0,
        attn_impl=attn_impl,
    )
    # Last real prompt token per row: the max masked index (works for both
    # left- and right-padded prompts; sum-1 would break left padding).
    last_idx = jnp.max(
        jnp.where(attention_mask != 0, jnp.arange(T)[None], -1), axis=-1
    )
    last_hidden = jnp.take_along_axis(
        hidden, last_idx[:, None, None], axis=1
    )[:, 0]
    logits = dec.lm_logits(lm, last_hidden)
    # Generated token i lives at per-row slot start+i, which is both its
    # cache slot and its RoPE position: it continues the prompt's
    # slot-indexed positions seamlessly for left-padded rows (start == T)
    # and right-padded rows (start == n_real; the pad slots hold no K/V
    # thanks to the masked cache writes above).
    return _decode_from_logits(lm, llm_cfg, gc, logits, cache, cache_mask0,
                               last_idx + 1, rng)


def _decode_from_logits(lm, llm_cfg: LLMConfig, gc: GenerationConfig,
                        logits, cache, cache_mask, start, rng,
                        return_state: bool = False):
    """Sample-and-extend loop shared by ``generate`` and
    ``generate_from_prefix``: ``logits`` (B, V) for the last real prompt
    token, ``start`` (B,) the first free cache slot per row.

    ``return_state=True`` also returns the final (cache, cache_mask) so
    a session can continue the conversation (``ChatSession``).  For B=1
    the loop exits the step after EOS, so every slot the mask marks
    holds a kept token's K/V; with B > 1, rows that finish early keep
    writing pad K/V into marked slots until ALL rows finish — resuming
    such a cache would attend to pad garbage, so sessions are B=1."""
    B = logits.shape[0]
    rng, key = jax.random.split(rng)
    next_tok = _sample(logits, gc, key)

    out0 = jnp.full((B, gc.max_new_tokens), gc.pad_token_id, jnp.int32)
    out0 = out0.at[:, 0].set(next_tok.astype(jnp.int32))
    finished0 = next_tok == gc.eos_token_id
    rows = jnp.arange(B)

    def cond(state):
        step, _, _, finished, _, _ = state
        return (step < gc.max_new_tokens - 1) & ~jnp.all(finished)

    def body(state):
        step, out, cache, finished, mask, rng = state
        tok = out[:, step]
        emb = dec.embed_tokens(lm, tok[:, None])
        slot = start + step  # (B,)
        mask = mask.at[rows, slot].set(1)
        hidden, cache = decoder_forward_cached(
            lm, llm_cfg, emb, cache, slot[:, None], mask
        )
        logits = dec.lm_logits(lm, hidden[:, 0])
        rng, key = jax.random.split(rng)
        nxt = _sample(logits, gc, key).astype(jnp.int32)
        nxt = jnp.where(finished, gc.pad_token_id, nxt)
        out = out.at[:, step + 1].set(nxt)
        finished = finished | (nxt == gc.eos_token_id)
        return step + 1, out, cache, finished, mask, rng

    state = (0, out0, cache, finished0, cache_mask, rng)
    _, out, cache, _, mask, _ = jax.lax.while_loop(cond, body, state)
    if return_state:
        return out, cache, mask
    return out


class PrefixState(NamedTuple):
    """A prompt prefix prefilled once, continued by many suffixes.

    The judge workload asks ~34 rubric questions per video
    (``eval/judges.py: run_fine_grained_benchmark``); every prompt
    shares system + "Frame{i}: <image>..." — the image tokens dominate
    (e.g. 2048 of ~2112) — and differs only in the trailing question.
    Prefill that shared prefix ONCE into a cache sized for the longest
    suffix + decode budget, then each question prefills only its suffix
    (``generate_from_prefix``).  The reference re-runs the full prompt
    per question (swift ``inference``); prefix caching is the standard
    production-serving answer.  Fields: ``cache`` with slots
    [0, n_prefix) filled, ``cache_mask`` (B, max_len) marking them, and
    ``n_prefix`` (B,) real prefix lengths (prefixes are right-padded).
    """

    cache: KVCache
    cache_mask: jnp.ndarray
    n_prefix: jnp.ndarray


def prefill_prefix(
    params, cfg: ChatConfig,
    input_ids: jnp.ndarray,  # (B, P) RIGHT-padded prefix tokens
    attention_mask: jnp.ndarray,  # (B, P)
    max_len: int,  # P + longest-suffix bucket + max_new_tokens
    pixel_values: Optional[jnp.ndarray] = None,
    vision_embeds: Optional[jnp.ndarray] = None,
    attn_impl: str = "auto",
    kv_quant: bool = False,
) -> PrefixState:
    """Prefill a shared prompt prefix (no logits; the prefix never ends
    a prompt).  The prefix enters an EMPTY cache, so the flash prefill
    path applies; suffix continuations must NOT (see
    ``generate_from_prefix``)."""
    lm = params["language_model"]
    B, P = input_ids.shape
    embeds = dec.embed_tokens(lm, input_ids)
    if vision_embeds is None and pixel_values is not None:
        vision_embeds = extract_feature(params, cfg, pixel_values,
                                        attn_impl=attn_impl, remat=False)
    if vision_embeds is not None:
        embeds = scatter_image_embeds(
            embeds, input_ids, vision_embeds, cfg.img_context_token_id
        )
    slot_ids = jnp.broadcast_to(jnp.arange(P)[None], (B, P))
    cache = init_kv_cache(cfg.llm, B, max_len, dtype=embeds.dtype,
                          quant=kv_quant)
    cache_mask = jnp.pad(attention_mask, ((0, 0), (0, max_len - P)))
    _, cache = decoder_forward_cached(
        lm, cfg.llm, embeds, cache, slot_ids, cache_mask,
        attn_impl=attn_impl,
    )
    return PrefixState(cache, cache_mask,
                       jnp.sum(attention_mask, axis=-1).astype(jnp.int32))


def generate_from_prefix(
    params, cfg: ChatConfig,
    state: PrefixState,
    suffix_ids: jnp.ndarray,  # (B, S) RIGHT-padded suffix tokens
    suffix_mask: jnp.ndarray,  # (B, S)
    generation_config: GenerationConfig = GenerationConfig(),
    rng: Optional[jax.Array] = None,
    return_state: bool = False,
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """Continue a cached prefix with a per-question suffix, then decode.
    ``return_state=True`` also returns the post-decode (cache, mask) for
    multi-turn continuation (see ``_decode_from_logits``; B=1 only).

    The suffix occupies slots [n_prefix, n_prefix + s_real) — contiguous
    with the prefix, so RoPE positions and causality are IDENTICAL to
    prefilling the whole prompt at once.  Suffix attention reads the
    non-empty cache: on TPU (``attn_impl`` "auto"/"flash") it runs the
    SAME flash kernel as a full-prompt prefill, with per-row ``q_offset =
    n_prefix`` supplying global causality — so prefix-cached decode is
    numerically the full-prompt path's, and a greedy tie cannot flip on
    kernel choice (docs/PARITY.md caveat closed).  ``attn_impl="xla"``
    (and "auto" off-TPU) keeps the windowed bias path — suffixes are
    short, so the S x max_len bias is cheap there.  ``kv_quant`` is
    inherited from the state's cache dtype.
    """
    gc = generation_config
    lm = params["language_model"]
    B, S = suffix_ids.shape
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    emb = dec.embed_tokens(lm, suffix_ids)
    slots = state.n_prefix[:, None] + jnp.arange(S)[None]  # (B, S)
    rows = jnp.arange(B)[:, None]
    # Mark the suffix's real slots valid (disjoint from prefix slots and
    # currently zero, so the add is a set).
    cache_mask = state.cache_mask.at[rows, slots].add(
        suffix_mask.astype(state.cache_mask.dtype))
    hidden, cache = decoder_forward_cached(
        lm, cfg.llm, emb, state.cache, slots, cache_mask,
        attn_impl=attn_impl, q_offset=state.n_prefix,
    )
    s_real = jnp.sum(suffix_mask, axis=-1)  # right-padded suffix
    last_hidden = jnp.take_along_axis(
        hidden, (s_real - 1)[:, None, None], axis=1
    )[:, 0]
    logits = dec.lm_logits(lm, last_hidden)
    return _decode_from_logits(lm, cfg.llm, gc, logits, cache, cache_mask,
                               state.n_prefix + s_real, rng,
                               return_state=return_state)


prefill_prefix_jitted = jax.jit(
    prefill_prefix, static_argnums=(1,),
    static_argnames=("max_len", "attn_impl", "kv_quant"))

generate_from_prefix_jitted = jax.jit(
    generate_from_prefix, static_argnums=(1,),
    static_argnames=("generation_config", "return_state", "attn_impl"))


def stack_prefix_states(states) -> PrefixState:
    """Batch B=1 prefix states into one (e.g. a preference pair's two
    videos) — rows are independent, so concatenation on the batch axis
    is exact.  All states must share max_len (same bucket)."""
    # (jax.tree.map never visits None nodes — the dense cache's None
    # scales pass through structurally.)
    caches = [s.cache for s in states]
    cache = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=1), *caches)
    return PrefixState(
        cache=cache,
        cache_mask=jnp.concatenate([s.cache_mask for s in states], axis=0),
        n_prefix=jnp.concatenate([s.n_prefix for s in states], axis=0),
    )


# One executable per (cfg, generation_config, attn_impl, shapes): callers
# that loop over prompts (judges, batch eval) should use this instead of
# the eager `generate` — with prompt bucketing the shape set stays tiny.
generate_jitted = jax.jit(generate, static_argnums=(1,),
                          static_argnames=("generation_config", "attn_impl"))


def batch_chat(
    params, cfg: ChatConfig, tokenizer, questions,
    pixel_values=None, num_patches_lists=None,
    generation_config: GenerationConfig = GenerationConfig(),
    attn_impl: str = "auto",
    vision_embeds=None,
):
    """Batched single-turn chat (``modeling_internvl_chat.py:336-367``).

    Prompts are left-padded into one batch (generation positions stay
    aligned — see ``generate``'s mask-cumsum positions) and decoded in one
    jit'd call; the per-question tile stacks concatenate in order, matching
    the flattened ``<IMG_CONTEXT>`` scatter.
    """
    import numpy as np

    from ..data.conversation import get_template
    from ..data.prompts import prepare_chat_input

    chats = []
    for i, q in enumerate(questions):
        npl = num_patches_lists[i] if num_patches_lists else None
        chats.append(prepare_chat_input(
            cfg, tokenizer, q, num_patches_list=npl,
            has_image=pixel_values is not None or vision_embeds is not None,
            require_gating=False,
        ))
    # Bucketed batch width -> one compiled executable per bucket.
    T = round_up_bucket(max(c.input_ids.shape[1] for c in chats))
    pad_id = getattr(tokenizer, "pad_token_id", None) or cfg.llm.pad_token_id
    ids = np.full((len(chats), T), pad_id, np.int32)
    mask = np.zeros((len(chats), T), np.int32)
    for i, c in enumerate(chats):
        L = c.input_ids.shape[1]
        ids[i, T - L:] = c.input_ids[0]
        mask[i, T - L:] = c.attention_mask[0]

    template = get_template(cfg.template)
    eos_id = tokenizer.convert_tokens_to_ids(template.sep.strip())
    gc = generation_config._replace(eos_token_id=eos_id, pad_token_id=pad_id)
    out = generate_jitted(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask),
        pixel_values=None if pixel_values is None else jnp.asarray(pixel_values),
        generation_config=gc, attn_impl=attn_impl,
        vision_embeds=vision_embeds,
    )
    responses = []
    for row in np.asarray(out):
        toks = [int(t) for t in row]
        if eos_id in toks:
            toks = toks[: toks.index(eos_id)]
        responses.append(
            tokenizer.decode(toks) if hasattr(tokenizer, "decode") else toks
        )
    return responses


@functools.lru_cache(maxsize=16)
def _stream_fns(cfg: ChatConfig, gc: GenerationConfig, T: int,
                has_vision: bool, attn_impl: str):
    """Cached jitted (prefill, decode_step) for the streaming surface —
    one trace per (config, generation config, prompt BUCKET): callers pad
    the prompt to ``round_up_bucket`` so conversations of different
    lengths share executables."""
    llm_cfg = cfg.llm
    max_len = T + gc.max_new_tokens
    B = 1

    @jax.jit
    def prefill(params, input_ids, attention_mask, pixel_values):
        embeds = dec.embed_tokens(params["language_model"], input_ids)
        if has_vision:
            vit = extract_feature(params, cfg, pixel_values,
                                  attn_impl=attn_impl, remat=False)
            embeds = scatter_image_embeds(
                embeds, input_ids, vit, cfg.img_context_token_id)
        slot_ids = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
        cache = init_kv_cache(llm_cfg, B, max_len, dtype=embeds.dtype,
                              quant=gc.kv_quant)
        cache_mask = jnp.pad(attention_mask,
                             ((0, 0), (0, gc.max_new_tokens)))
        hidden, cache = decoder_forward_cached(
            params["language_model"], llm_cfg, embeds, cache, slot_ids,
            cache_mask, attn_impl=attn_impl)
        last_idx = jnp.max(
            jnp.where(attention_mask != 0, jnp.arange(T)[None], -1), axis=-1)
        last_hidden = jnp.take_along_axis(
            hidden, last_idx[:, None, None], axis=1)[:, 0]
        return dec.lm_logits(params["language_model"], last_hidden), \
            cache, cache_mask, last_idx + 1

    @jax.jit
    def decode_step(lm, tok, cache, cache_mask, slot):
        emb = dec.embed_tokens(lm, tok[:, None])
        cache_mask = cache_mask.at[jnp.arange(B), slot].set(1)
        hidden, cache = decoder_forward_cached(
            lm, llm_cfg, emb, cache, slot[:, None], cache_mask)
        return dec.lm_logits(lm, hidden[:, 0]), cache, cache_mask

    return prefill, decode_step


def stream_generate(
    params, cfg: ChatConfig,
    input_ids: jnp.ndarray,  # (1, T)
    attention_mask: jnp.ndarray,
    pixel_values: Optional[jnp.ndarray] = None,
    generation_config: GenerationConfig = GenerationConfig(),
    rng: Optional[jax.Array] = None,
    attn_impl: str = "auto",
):
    """Token-by-token generation as a Python generator (B=1).

    Equivalent of ``InternLM2ForCausalLM.stream_chat``'s threaded
    TextIteratorStreamer (``modeling_internlm2.py:1270-1292``) — without the
    thread: JAX dispatch is already asynchronous, so a host-side generator
    stepping one jit'd single-token forward per yield is the idiomatic
    streaming surface.  The jitted prefill/step pair is cached per
    (config, generation config, prompt length) — new conversations with
    the same shape reuse the executables.
    """
    gc = generation_config
    lm = params["language_model"]
    B, T = input_ids.shape
    assert B == 1, "streaming is a single-conversation surface"
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    # Bucket the prompt so new conversations reuse the cached executables
    # (the factory is keyed on the padded length).
    Tb = round_up_bucket(T)
    if Tb != T:
        input_ids = jnp.pad(input_ids, ((0, 0), (0, Tb - T)),
                            constant_values=gc.pad_token_id)
        attention_mask = jnp.pad(attention_mask, ((0, 0), (0, Tb - T)))

    prefill, decode_step = _stream_fns(cfg, gc, Tb, pixel_values is not None,
                                       attn_impl)

    logits, cache, cache_mask, start = prefill(
        params, input_ids, attention_mask, pixel_values)
    rng, key = jax.random.split(rng)
    tok = _sample(logits, gc, key).astype(jnp.int32)
    for step in range(gc.max_new_tokens):
        t = int(tok[0])
        if t == gc.eos_token_id:
            return
        yield t
        if step == gc.max_new_tokens - 1:
            return
        logits, cache, cache_mask = decode_step(
            lm, tok, cache, cache_mask, start + step)
        rng, key = jax.random.split(rng)
        tok = _sample(logits, gc, key).astype(jnp.int32)


def stream_chat(
    params, cfg: ChatConfig, tokenizer, question: str,
    pixel_values=None, num_patches_list=None, history=None,
    generation_config: GenerationConfig = GenerationConfig(),
    attn_impl: str = "auto",
):
    """Streaming single-turn chat: yields the growing response string.

    The final yielded value is the complete response; callers wanting the
    updated history append ``(question, response)`` themselves (as the
    reference's streamer consumers do)."""
    from ..data.conversation import get_template
    from ..data.prompts import prepare_chat_input

    if num_patches_list is None and pixel_values is not None:
        num_patches_list = [pixel_values.shape[0]]
    chat_in = prepare_chat_input(
        cfg, tokenizer, question, num_patches_list=num_patches_list,
        history=history, require_gating=False,
    )
    template = get_template(cfg.template)
    eos_id = tokenizer.convert_tokens_to_ids(template.sep.strip())
    gc = generation_config._replace(eos_token_id=eos_id)
    toks: list = []
    for t in stream_generate(
        params, cfg,
        jnp.asarray(chat_in.input_ids), jnp.asarray(chat_in.attention_mask),
        pixel_values=None if pixel_values is None
        else jnp.asarray(pixel_values),
        generation_config=gc, attn_impl=attn_impl,
    ):
        toks.append(t)
        yield (tokenizer.decode(toks) if hasattr(tokenizer, "decode")
               else list(toks))


def chat(
    params, cfg: ChatConfig, tokenizer, question: str,
    pixel_values=None, num_patches_list=None,
    history=None, generation_config: GenerationConfig = GenerationConfig(),
    attn_impl: str = "auto",
    vision_embeds=None,
) -> Tuple[str, list]:
    """Single-turn(ed) chat (``modeling_internvl_chat.py:264-334``)."""
    import numpy as np

    from ..data.conversation import get_template
    from ..data.prompts import prepare_chat_input

    if num_patches_list is None and pixel_values is not None:
        num_patches_list = [pixel_values.shape[0]]
    if num_patches_list is None and vision_embeds is not None:
        # One tile stack: without this the prompt would carry zero
        # <IMG_CONTEXT> tokens and the scatter would silently no-op.
        num_patches_list = [vision_embeds.shape[0]]
    chat_in = prepare_chat_input(
        cfg, tokenizer, question, num_patches_list=num_patches_list,
        history=history, require_gating=False,
    )
    template = get_template(cfg.template)
    eos_id = tokenizer.convert_tokens_to_ids(template.sep.strip())
    pad_id = getattr(tokenizer, "pad_token_id", None) or cfg.llm.pad_token_id
    gc = generation_config._replace(eos_token_id=eos_id, pad_token_id=pad_id)
    # Bucket the prompt so repeated chats (judge loops) reuse ONE compiled
    # generate executable; generate() handles the padded tail via the mask.
    ids = np.asarray(chat_in.input_ids)
    mask = np.asarray(chat_in.attention_mask)
    T = ids.shape[1]
    Tb = round_up_bucket(T)
    if Tb != T:
        pad = ((0, 0), (0, Tb - T))
        ids = np.pad(ids, pad, constant_values=gc.pad_token_id)
        mask = np.pad(mask, pad)
    out = generate_jitted(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask),
        pixel_values=None if pixel_values is None else jnp.asarray(pixel_values),
        generation_config=gc, attn_impl=attn_impl,
        vision_embeds=vision_embeds,
    )
    toks = [int(t) for t in np.asarray(out[0])]
    if eos_id in toks:
        toks = toks[: toks.index(eos_id)]
    response = tokenizer.decode(toks) if hasattr(tokenizer, "decode") else toks
    new_history = (history or []) + [(question, response)]
    return response, new_history


class ChatSession:
    """Multi-turn chat that keeps the conversation's KV across turns.

    ``chat(history=...)`` — like the reference's
    ``InternVLChatModel.chat`` (``modeling_internvl_chat.py:264-334``) —
    re-prefills the ENTIRE conversation every turn, so turn t pays
    O(conversation length) prefill again.  A session instead treats each
    turn as a suffix continuation of the cached conversation: the new
    user turn's tokens (plus the previous answer's final token, whose
    K/V decode never wrote) prefill at the next free slots, and the
    decode loop's own cache writes persist for the turn after.

    Exactness is guarded token-by-token: each turn re-renders the full
    conversation through ``prepare_chat_input`` and compares its token
    prefix against what the cache holds; if the tokenizer merges across
    a turn boundary (re-tokenized answer text != generated tokens), the
    session re-prefills from scratch — same answers, just slower.  B=1
    only (see ``_decode_from_logits``).  Vision enters on the first turn.
    """

    def __init__(self, params, cfg: ChatConfig, tokenizer,
                 max_len: int = 2048,
                 generation_config: GenerationConfig = GenerationConfig(),
                 attn_impl: str = "auto", kv_quant: bool = False,
                 suffix_bucket: int = 128):
        from ..data.conversation import get_template

        self.params, self.cfg, self.tokenizer = params, cfg, tokenizer
        template = get_template(cfg.template)
        eos = tokenizer.convert_tokens_to_ids(template.sep.strip())
        pad = getattr(tokenizer, "pad_token_id", None) or cfg.llm.pad_token_id
        self.gc = generation_config._replace(eos_token_id=eos,
                                             pad_token_id=pad)
        self.max_len = max_len
        self.attn_impl = attn_impl
        self.kv_quant = kv_quant
        self.suffix_bucket = suffix_bucket
        self.history: list = []
        self._state: Optional[PrefixState] = None
        self._cached: list = []   # token ids whose K/V are in the cache
        self._pending: list = []  # generated tail whose K/V is not yet

    def _render(self, question, num_patches_list):
        from ..data.prompts import prepare_chat_input

        chat_in = prepare_chat_input(
            self.cfg, self.tokenizer, question,
            num_patches_list=num_patches_list, history=self.history,
            require_gating=False,
        )
        return [int(t) for t in chat_in.input_ids[0]]

    def _fresh_prefill(self, full_ids, pixel_values, vision_embeds):
        """(Re)build the session cache: flash-prefill everything but the
        last prompt token (empty cache -> flash path applies), which
        becomes the first suffix token."""
        import numpy as np

        P = len(full_ids) - 1
        Pb = round_up_bucket(max(P, 1))
        if Pb + self.suffix_bucket + self.gc.max_new_tokens > self.max_len:
            raise ValueError(
                f"conversation ({P} tokens) exceeds the session max_len "
                f"{self.max_len}; raise max_len at session start")
        ids = np.full((1, Pb), self.gc.pad_token_id, np.int32)
        ids[0, :P] = full_ids[:P]
        mask = np.zeros((1, Pb), np.int32)
        mask[0, :P] = 1
        self._state = prefill_prefix_jitted(
            self.params, self.cfg, jnp.asarray(ids), jnp.asarray(mask),
            max_len=self.max_len,
            pixel_values=pixel_values, vision_embeds=vision_embeds,
            attn_impl=self.attn_impl, kv_quant=self.kv_quant,
        )
        self._cached = list(full_ids[:P])
        self._pending = [full_ids[P]]

    def ask(self, question: str, pixel_values=None, vision_embeds=None,
            num_patches_list=None) -> str:
        import numpy as np

        if num_patches_list is None and pixel_values is not None:
            num_patches_list = [pixel_values.shape[0]]
        if num_patches_list is None and vision_embeds is not None:
            num_patches_list = [vision_embeds.shape[0]]
        if self.history and num_patches_list is not None:
            raise ValueError("vision enters on the FIRST turn only")

        full_ids = self._render(question, num_patches_list)
        known = self._cached + self._pending
        if self._state is None or full_ids[: len(known)] != known:
            # first turn, or the tokenizer merged across a turn boundary
            self._fresh_prefill(full_ids, pixel_values, vision_embeds)
            known = self._cached + self._pending
        suffix = self._pending + full_ids[len(known):]
        Sb = round_up_bucket(len(suffix), self.suffix_bucket)
        if (len(self._cached) + Sb + self.gc.max_new_tokens
                > self.max_len):
            raise ValueError(
                f"turn needs {len(self._cached) + Sb} prompt slots "
                f"+ {self.gc.max_new_tokens} decode slots; raise max_len")
        sids = np.full((1, Sb), self.gc.pad_token_id, np.int32)
        sids[0, : len(suffix)] = suffix
        smask = np.zeros((1, Sb), np.int32)
        smask[0, : len(suffix)] = 1
        out, cache, mask = generate_from_prefix_jitted(
            self.params, self.cfg, self._state, jnp.asarray(sids),
            jnp.asarray(smask), generation_config=self.gc,
            return_state=True,
        )
        toks = [int(t) for t in np.asarray(out[0])]
        if self.gc.eos_token_id in toks:
            toks = toks[: toks.index(self.gc.eos_token_id) + 1]
        # K/V now present for the suffix + every generated token but the
        # last (sampled, never re-embedded); it leads the next suffix.
        self._cached += suffix + toks[:-1]
        self._pending = toks[-1:]
        self._state = PrefixState(cache, mask,
                                  jnp.asarray([len(self._cached)],
                                              jnp.int32))
        answer = toks[:-1] if toks[-1] == self.gc.eos_token_id else toks
        response = (self.tokenizer.decode(answer)
                    if hasattr(self.tokenizer, "decode") else answer)
        self.history.append((question, response))
        return response
