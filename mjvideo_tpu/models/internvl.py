"""InternVL fusion model: ViT -> pixel-shuffle -> projector -> LLM.

Replaces ``modeling_internvl_chat.py`` (InternVLChatModel).  TPU-first
differences from the reference:

* The ``<IMG_CONTEXT>`` scatter (``modeling_internvl_chat.py:176-186``) is a
  boolean-masked in-place write in torch, which forces dynamic shapes; here it
  is a cumsum-indexed gather + ``where`` — fully static, in-graph, no D2H sync.
* ``pixel_shuffle`` is pure reshape/transpose (free under XLA).
* No fake-distributed ceremony: the reference requires an NCCL process group
  even for world_size=1 (``eval_genai_mjvideo.py:17-24``); here single-host
  runs need nothing.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..configs import ChatConfig
from ..ops.matmul import dot, gelu
from ..ops.norms import layer_norm
from ..ops.pixel_shuffle import pixel_shuffle
from . import decoder as dec
from .vit import init_vit_params, vit_forward


def init_projector_params(key, cfg: ChatConfig, dtype=jnp.float32):
    """mlp1 projector: LayerNorm -> Linear -> GELU -> Linear.

    Reference: ``modeling_internvl_chat.py:135-140``.
    """
    vit_h = cfg.vision.hidden_size * int(1 / cfg.downsample_ratio) ** 2
    llm_h = cfg.llm.hidden_size
    k1, k2 = jax.random.split(key)

    def dense(key, shape):
        return (jax.random.normal(key, shape) * 0.02).astype(dtype)

    return {
        "norm": {"weight": jnp.ones((vit_h,), dtype),
                 "bias": jnp.zeros((vit_h,), dtype)},
        "fc1": {"kernel": dense(k1, (vit_h, llm_h)),
                "bias": jnp.zeros((llm_h,), dtype)},
        "fc2": {"kernel": dense(k2, (llm_h, llm_h)),
                "bias": jnp.zeros((llm_h,), dtype)},
    }


def init_chat_params(key, cfg: ChatConfig, dtype=jnp.float32,
                     with_lm_head: bool = True):
    kv, kp, kl = jax.random.split(key, 3)
    return {
        "vision_model": init_vit_params(kv, cfg.vision, dtype),
        "mlp1": init_projector_params(kp, cfg, dtype),
        "language_model": dec.init_decoder_params(
            kl, cfg.llm, dtype, with_lm_head=with_lm_head
        ),
    }


def apply_projector(p, x: jnp.ndarray) -> jnp.ndarray:
    h = layer_norm(x, p["norm"]["weight"], p["norm"]["bias"], eps=1e-5)
    h = dot(h, p["fc1"]["kernel"]) + p["fc1"]["bias"]
    h = gelu(h)
    h = dot(h, p["fc2"]["kernel"]) + p["fc2"]["bias"]
    return h


def extract_feature(
    params, cfg: ChatConfig, pixel_values: jnp.ndarray,
    attn_impl: str = "auto", remat: bool = True, vit_rng=None,
    sp=None,
) -> jnp.ndarray:
    """ViT -> drop cls -> HxW grid -> pixel_shuffle -> projector.

    Reference: ``modeling_internvl_chat.py:244-262``.  Returns
    (num_tiles, num_image_token, llm_hidden).

    ``sp={'mesh': Mesh, 'axis': ...}`` (the sequence-parallel spec): the
    TILE batch shards over the same mesh axis the decoder's sequence
    rides.  Tiles are embarrassingly parallel — per-tile sequence 1,025,
    no cross-tile attention (reference hot loop:
    ``modeling_intern_vit.py:341-352``) — so each chip encodes ~P/n tiles
    and the embeds all-gather once (one ICI collective for the whole
    tower) before the scatter.  Without this, an n-chip SP run duplicates
    (n-1)/n of the vision FLOPs, which at the 16-32-frame x max_num=12
    long-context configs is roughly half of per-clip compute.  Eval only:
    with ``vit_rng`` set (DropPath noise is drawn per tile-batch index,
    which sharding would re-index) the tower falls back to replicated.
    """
    if (sp is not None and vit_rng is None
            and sp["mesh"].shape[sp.get("axis", "data")] > 1):
        return _sp_extract_feature(params, cfg, pixel_values, attn_impl,
                                   remat, sp)
    return _tile_features(params["vision_model"], params["mlp1"], cfg,
                          pixel_values, attn_impl, remat, rng=vit_rng)


def _sp_extract_feature(params, cfg: ChatConfig, pixel_values, attn_impl,
                        remat, sp):
    """Tile-sharded vision tower for sequence-parallel mode.

    Pads the tile axis to a multiple of the axis size (static at trace
    time), runs ViT + pixel_shuffle + projector on each chip's local tile
    slice under ``shard_map`` (Pallas kernels see local shapes — fully
    manual, no GSPMD-vs-pallas_call ambiguity), all-gathers the projected
    embeds, and drops the pad rows.  The vision/projector params enter
    replicated (activation tensors dwarf them at these tile counts).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh, axis = sp["mesh"], sp.get("axis", "data")
    n = mesh.shape[axis]
    n_tiles = pixel_values.shape[0]
    pad = (-n_tiles) % n
    if pad:
        pixel_values = jnp.concatenate(
            [pixel_values,
             jnp.zeros((pad,) + pixel_values.shape[1:], pixel_values.dtype)],
            axis=0)

    def body(vp, pp, pix_l):
        emb_l = _tile_features(vp, pp, cfg, pix_l, attn_impl, remat)
        return jax.lax.all_gather(emb_l, axis, axis=0, tiled=True)

    tile_spec = P(axis, *([None] * (pixel_values.ndim - 1)))
    fn = shard_map(
        body, mesh=mesh, in_specs=(P(), P(), tile_spec), out_specs=P(),
        check_vma=False,
    )
    emb = fn(params["vision_model"], params["mlp1"], pixel_values)
    return emb[:n_tiles]


def _tile_features(vision_params, proj_params, cfg: ChatConfig, pixel_values,
                   attn_impl, remat, rng=None):
    """Per-tile feature pipeline shared by the plain and SP paths."""
    vit_out = vit_forward(
        vision_params, cfg.vision, pixel_values,
        select_layer=cfg.select_layer, attn_impl=attn_impl, remat=remat,
        rng=rng,
    )
    vit_embeds = vit_out[:, 1:, :]  # drop cls
    n, s, c = vit_embeds.shape
    hw = int(s**0.5)
    vit_embeds = vit_embeds.reshape(n, hw, hw, c)
    vit_embeds = pixel_shuffle(
        vit_embeds, scale_factor=cfg.downsample_ratio, ps_version=cfg.ps_version
    )
    vit_embeds = vit_embeds.reshape(n, -1, vit_embeds.shape[-1])
    return apply_projector(proj_params, vit_embeds)


# Jitted vision tower for callers that encode a video once and reuse the
# embeds across many generations (judge loops) — see ``generate.generate``'s
# ``vision_embeds`` argument.
extract_feature_jitted = jax.jit(
    extract_feature, static_argnums=(1,),
    static_argnames=("attn_impl", "remat"))


def scatter_image_embeds(
    input_embeds: jnp.ndarray,  # (B, T, C)
    input_ids: jnp.ndarray,  # (B, T)
    vit_embeds: jnp.ndarray,  # (P, n_tok, C)
    img_context_token_id: int,
) -> jnp.ndarray:
    """Place ViT tokens at ``<IMG_CONTEXT>`` positions, in flattened order.

    Static-shape equivalent of ``input_embeds[selected] = vit_embeds`` at
    ``modeling_internvl_chat.py:176-186``: the k-th True position of
    ``selected`` (row-major over B*T) receives the k-th ViT token.
    """
    B, T, C = input_embeds.shape
    flat_ids = input_ids.reshape(B * T)
    selected = flat_ids == img_context_token_id
    vit_flat = vit_embeds.reshape(-1, C).astype(input_embeds.dtype)
    # Index of each selected position within the ViT token stream.
    idx = jnp.cumsum(selected.astype(jnp.int32)) - 1
    idx = jnp.clip(idx, 0, vit_flat.shape[0] - 1)
    gathered = vit_flat[idx]  # (B*T, C)
    out = jnp.where(selected[:, None], gathered, input_embeds.reshape(B * T, C))
    return out.reshape(B, T, C)


def chat_forward(
    params,
    cfg: ChatConfig,
    pixel_values: jnp.ndarray,  # (P, H, W, 3)
    input_ids: jnp.ndarray,  # (B, T)
    attention_mask: Optional[jnp.ndarray] = None,
    position_ids: Optional[jnp.ndarray] = None,
    attn_impl: str = "auto",
    remat: bool = True,
    vit_rng=None,
    img_context_token_id: Optional[int] = None,
    sp=None,
) -> jnp.ndarray:
    """Full multimodal forward; returns final hidden states (B, T, C).

    Matches ``InternVLChatModel.forward`` (``modeling_internvl_chat.py:
    146-226``) up to (and excluding) the LM head — the reward path consumes
    hidden states, so the vocab-sized logits matmul is skipped entirely
    (the reference computes 92k-dim logits it never uses).

    ``img_context_token_id`` overrides the config scatter id — the
    reference assigns it from the tokenizer at load time
    (``model.img_context_token_id = tokenizer.convert_tokens_to_ids(
    IMG_CONTEXT_TOKEN)``); pass the tokenizer's id when one is in hand.

    ``sp={'mesh': Mesh, 'axis': ..., 'kind': 'ring'|'allgather'}`` runs the
    decoder sequence-parallel (``parallel/sequence.py``): shard input_ids /
    attention_mask on the token dim and the LLM attention distributes over
    the mesh — the long-context capability the reference's 3,072-token
    collator ceiling forecloses (SURVEY.md §5).  The ViT shards its TILE
    batch over the same axis (tiles are independent; see
    ``extract_feature``) and all-gathers the projected embeds before the
    position-wise scatter, so both towers' FLOPs split n ways.
    """
    input_embeds = dec.embed_tokens(params["language_model"], input_ids)
    vit_embeds = extract_feature(
        params, cfg, pixel_values, attn_impl=attn_impl, remat=remat,
        vit_rng=vit_rng, sp=sp,
    )
    if img_context_token_id is None:
        img_context_token_id = cfg.img_context_token_id
    input_embeds = scatter_image_embeds(
        input_embeds, input_ids, vit_embeds, img_context_token_id
    )
    return dec.decoder_forward(
        params["language_model"],
        cfg.llm,
        input_embeds,
        attention_mask=attention_mask,
        position_ids=position_ids,
        attn_impl=attn_impl,
        remat=remat,
        sp=sp,
    )
