"""VideoScore (Mantis Idefics2) backbone, TPU-native.

Completes C22 (SURVEY.md §2.1): the reference's VideoScore baseline runs a
Mantis ``Idefics2ForSequenceClassification`` regression judge in torch
(``eval_genai_videoScore.py:41-129``).  This is a from-scratch JAX port of
the Idefics2 architecture — SigLIP-style vision tower, MLP modality
projection + perceiver resampler connector, Mistral text model (reusing our
llama-family decoder), and a last-non-pad-token regression head — validated
numerically against the transformers implementation in tests.

TPU-first notes:

* vision/perceiver layers are stacked + ``lax.scan`` like the other towers;
* the image-token scatter reuses ``internvl.scatter_image_embeds``;
* Mistral == our ``decoder`` llama path (sliding-window attention never
  activates at VideoScore's <4k contexts, where it equals full causal).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..configs import LLMConfig
from ..ops.attention import multi_head_attention
from ..ops.matmul import dot, dot_f32
from ..ops.norms import layer_norm, rms_norm
from . import decoder as dec
from .internvl import scatter_image_embeds
from .vit import patch_embed


@dataclass(frozen=True)
class PerceiverConfig:
    depth: int = 3
    n_heads: int = 16
    head_dim: int = 96
    num_key_value_heads: int = 4
    n_latents: int = 64
    rms_norm_eps: float = 1e-6


@dataclass(frozen=True)
class SigLIPVisionConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    patch_size: int = 14
    image_size: int = 980
    layer_norm_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


@dataclass(frozen=True)
class VideoScoreConfig:
    vision: SigLIPVisionConfig = field(default_factory=SigLIPVisionConfig)
    perceiver: PerceiverConfig = field(default_factory=PerceiverConfig)
    text: LLMConfig = field(default_factory=lambda: LLMConfig(
        architecture="llama", vocab_size=32003, hidden_size=4096,
        intermediate_size=14336, num_hidden_layers=32,
        num_attention_heads=32, num_key_value_heads=8,
        rope_theta=10000.0, rms_norm_eps=1e-5, pad_token_id=0,
    ))
    image_token_id: int = 32001
    num_labels: int = 1


def videoscore_config_from_hf(d: Dict[str, Any]) -> VideoScoreConfig:
    """Build a VideoScoreConfig from an HF Idefics2 config.json dict."""
    v = d.get("vision_config", {})
    p = d.get("perceiver_config", {})
    t = d.get("text_config", {})
    return VideoScoreConfig(
        vision=SigLIPVisionConfig(
            hidden_size=v.get("hidden_size", 1152),
            intermediate_size=v.get("intermediate_size", 4304),
            num_hidden_layers=v.get("num_hidden_layers", 27),
            num_attention_heads=v.get("num_attention_heads", 16),
            patch_size=v.get("patch_size", 14),
            image_size=v.get("image_size", 980),
            layer_norm_eps=v.get("layer_norm_eps", 1e-6),
        ),
        perceiver=PerceiverConfig(
            depth=p.get("resampler_depth", 3),
            n_heads=p.get("resampler_n_heads", 16),
            head_dim=p.get("resampler_head_dim", 96),
            num_key_value_heads=p.get("num_key_value_heads", 4),
            n_latents=p.get("resampler_n_latents", 64),
            rms_norm_eps=p.get("rms_norm_eps", 1e-6),
        ),
        text=LLMConfig(
            architecture="llama",
            vocab_size=t.get("vocab_size", 32003),
            hidden_size=t.get("hidden_size", 4096),
            intermediate_size=t.get("intermediate_size", 14336),
            num_hidden_layers=t.get("num_hidden_layers", 32),
            num_attention_heads=t.get("num_attention_heads", 32),
            num_key_value_heads=t.get("num_key_value_heads", 8),
            rope_theta=t.get("rope_theta", 10000.0),
            rms_norm_eps=t.get("rms_norm_eps", 1e-5),
            max_position_embeddings=t.get("max_position_embeddings", 32768),
            pad_token_id=t.get("pad_token_id", 0) or 0,
        ),
        image_token_id=d.get("image_token_id", 32001),
        num_labels=d.get("num_labels", len((
            "visual quality", "temporal consistency", "dynamic degree",
            "text-to-video alignment", "factual consistency"))),
    )


def _k(w, dtype):
    import numpy as np

    return jnp.asarray(np.ascontiguousarray(np.asarray(w).T)).astype(dtype)


def _a(w, dtype):
    import numpy as np

    return jnp.asarray(np.asarray(w)).astype(dtype)


def import_videoscore_params(
    state: Dict[str, Any], cfg: VideoScoreConfig, dtype=jnp.float32,
    prefix: str = "",
) -> Dict[str, Any]:
    """Map the HF Idefics2 state dict onto our pytree (stacked layers)."""
    import numpy as np

    from ..utils.checkpoint import import_siglip_vision

    g = lambda n: state[prefix + n]  # noqa: E731

    vision = import_siglip_vision(state, cfg.vision, dtype,
                                  prefix=prefix + "vision_model.")

    pc = cfg.perceiver

    def p_stack(name, transpose=False):
        ts = [np.asarray(g(
            f"connector.perceiver_resampler.layers.{i}.{name}"))
            for i in range(pc.depth)]
        arr = np.stack(ts)
        if transpose:
            arr = arr.transpose(0, 2, 1)
        return _a(arr, dtype)

    connector = {
        "modality_projection": {
            "gate": {"kernel": _k(g("connector.modality_projection."
                                    "gate_proj.weight"), dtype)},
            "up": {"kernel": _k(g("connector.modality_projection."
                                  "up_proj.weight"), dtype)},
            "down": {"kernel": _k(g("connector.modality_projection."
                                    "down_proj.weight"), dtype)},
        },
        "latents": _a(g("connector.perceiver_resampler.latents"), dtype),
        "layers": {
            "ln_latents": {"weight": p_stack("input_latents_norm.weight")},
            "ln_context": {"weight": p_stack("input_context_norm.weight")},
            "q": {"kernel": p_stack("self_attn.q_proj.weight", True)},
            "k": {"kernel": p_stack("self_attn.k_proj.weight", True)},
            "v": {"kernel": p_stack("self_attn.v_proj.weight", True)},
            "o": {"kernel": p_stack("self_attn.o_proj.weight", True)},
            "ln_post": {"weight": p_stack("post_attention_layernorm.weight")},
            "gate": {"kernel": p_stack("mlp.gate_proj.weight", True)},
            "up": {"kernel": p_stack("mlp.up_proj.weight", True)},
            "down": {"kernel": p_stack("mlp.down_proj.weight", True)},
        },
        "norm": {"weight": _a(
            g("connector.perceiver_resampler.norm.weight"), dtype)},
    }

    # Text model: rename text_model.* -> model.* for the llama importer.
    from ..utils.checkpoint import import_decoder_params

    text_state = {
        "model." + k[len(prefix + "text_model."):]: v
        for k, v in state.items()
        if k.startswith(prefix + "text_model.")
    }
    text = import_decoder_params(text_state, cfg.text, dtype, prefix="",
                                 with_lm_head=False)

    params = {"vision_model": vision, "connector": connector, "text": text}
    score_key = prefix + "score.weight"
    if score_key in state:
        params["score"] = {"kernel": _k(g("score.weight"), dtype)}
    return params


def init_videoscore_params(key, cfg: VideoScoreConfig, dtype=jnp.float32,
                           num_labels: Optional[int] = None,
                           subset: Optional[tuple] = None):
    """Random-init params matching ``import_videoscore_params``'s tree
    exactly (shape-pinned against the importer in tests) — for hermetic
    tests and random-init on-chip benchmarks, like ``init_reward_params``.

    Projection widths follow transformers' Idefics2: the modality
    projection is an MLP vision_hidden -> text_intermediate -> text_hidden;
    each perceiver layer's MLP runs at 4x the text width.

    ``subset``: optional tuple of top-level keys to build (e.g.
    ``("vision_model", "connector")``) — initializing the 7B Mistral text
    tree is minutes of host-side threefry, so vision-only benchmarks skip
    it."""
    vc, pc, tc = cfg.vision, cfg.perceiver, cfg.text
    ks = iter(jax.random.split(key, 32))

    def dense(shape):
        return (jax.random.normal(next(ks), shape) * 0.02).astype(dtype)

    C, I, L = vc.hidden_size, vc.intermediate_size, vc.num_hidden_layers
    side = vc.image_size // vc.patch_size
    want = subset or ("vision_model", "connector", "text", "score")

    def vision_tree(): return {
        "patch_embedding": {
            "kernel": dense((vc.patch_size * vc.patch_size * 3, C)),
            "bias": jnp.zeros((C,), dtype),
        },
        "position_embedding": dense((side * side, C)),
        "layers": {
            "ln1": {"weight": jnp.ones((L, C), dtype),
                    "bias": jnp.zeros((L, C), dtype)},
            "ln2": {"weight": jnp.ones((L, C), dtype),
                    "bias": jnp.zeros((L, C), dtype)},
            "q": {"kernel": dense((L, C, C)), "bias": jnp.zeros((L, C), dtype)},
            "k": {"kernel": dense((L, C, C)), "bias": jnp.zeros((L, C), dtype)},
            "v": {"kernel": dense((L, C, C)), "bias": jnp.zeros((L, C), dtype)},
            "o": {"kernel": dense((L, C, C)), "bias": jnp.zeros((L, C), dtype)},
            "fc1": {"kernel": dense((L, C, I)),
                    "bias": jnp.zeros((L, I), dtype)},
            "fc2": {"kernel": dense((L, I, C)),
                    "bias": jnp.zeros((L, C), dtype)},
        },
        "post_layernorm": {"weight": jnp.ones((C,), dtype),
                           "bias": jnp.zeros((C,), dtype)},
    }

    Ct, It, d = tc.hidden_size, tc.intermediate_size, pc.depth
    Ip = 4 * Ct  # transformers: Idefics2PerceiverLayer MLP = 4x text width

    def connector_tree(): return {
        "modality_projection": {
            "gate": {"kernel": dense((C, It))},
            "up": {"kernel": dense((C, It))},
            "down": {"kernel": dense((It, Ct))},
        },
        "latents": dense((pc.n_latents, Ct)),
        "layers": {
            "ln_latents": {"weight": jnp.ones((d, Ct), dtype)},
            "ln_context": {"weight": jnp.ones((d, Ct), dtype)},
            "q": {"kernel": dense((d, Ct, pc.n_heads * pc.head_dim))},
            "k": {"kernel": dense((d, Ct,
                                   pc.num_key_value_heads * pc.head_dim))},
            "v": {"kernel": dense((d, Ct,
                                   pc.num_key_value_heads * pc.head_dim))},
            "o": {"kernel": dense((d, pc.n_heads * pc.head_dim, Ct))},
            "ln_post": {"weight": jnp.ones((d, Ct), dtype)},
            "gate": {"kernel": dense((d, Ct, Ip))},
            "up": {"kernel": dense((d, Ct, Ip))},
            "down": {"kernel": dense((d, Ip, Ct))},
        },
        "norm": {"weight": jnp.ones((Ct,), dtype)},
    }

    from .decoder import init_decoder_params

    builders = {
        "vision_model": vision_tree,
        "connector": connector_tree,
        "text": lambda: init_decoder_params(next(ks), tc, dtype,
                                            with_lm_head=False),
        "score": lambda: {
            "kernel": dense((Ct, num_labels or cfg.num_labels))},
    }
    return {k: builders[k]() for k in builders if k in want}


def _mlp_silu(p, x):
    return dot(jax.nn.silu(dot(x, p["gate"]["kernel"]))
               * dot(x, p["up"]["kernel"]), p["down"]["kernel"])


def _bucket_position_ids(gh: int, gw: int, side: int):
    """Idefics2's resolution-bucketized position ids for a full (gh, gw)
    patch grid: fractional coords scaled by (1 - 1e-6), bucketized against
    ``side`` equal bins (transformers Idefics2VisionEmbeddings.forward).
    For gh == gw == side this is max(i-1, 0), NOT arange."""
    import numpy as np

    def buckets(n):
        frac = np.arange(n) / n * (1 - 1e-6)
        boundaries = np.arange(1, side) / side
        return np.searchsorted(boundaries, frac, side="right")

    bh, bw = buckets(gh), buckets(gw)
    return (bh[:, None] * side + bw[None, :]).reshape(-1)


def masked_position_ids(patch_mask: jnp.ndarray, side: int) -> jnp.ndarray:
    """Per-image bucketized position ids for bottom/right-padded images
    (transformers ``Idefics2VisionEmbeddings.forward``): each image's
    valid (nb_h, nb_w) patch grid maps through fractional coordinates
    ``i / nb * (1 - 1e-6)`` into the ``side x side`` learned grid
    (``torch.bucketize(right=True)`` over ``arange(1/side, 1, 1/side)``
    == ``floor(frac * side)``); padded positions read embedding 0, whose
    contribution the attention mask then discards."""
    N, gh, gw = patch_mask.shape
    nb_h = patch_mask[:, :, 0].sum(axis=1)  # (N,) valid rows
    nb_w = patch_mask[:, 0, :].sum(axis=1)  # (N,) valid cols
    hi = jnp.arange(gh, dtype=jnp.float32)
    wi = jnp.arange(gw, dtype=jnp.float32)
    bh = jnp.floor(hi[None] / jnp.maximum(nb_h[:, None], 1)
                   * (1 - 1e-6) * side).astype(jnp.int32)  # (N, gh)
    bw = jnp.floor(wi[None] / jnp.maximum(nb_w[:, None], 1)
                   * (1 - 1e-6) * side).astype(jnp.int32)  # (N, gw)
    pos = bh[:, :, None] * side + bw[:, None, :]  # (N, gh, gw)
    return jnp.where(patch_mask, pos, 0).reshape(N, gh * gw)


def vision_forward(p, cfg: SigLIPVisionConfig, pixel_values: jnp.ndarray,
                   remat: bool = False, attn_impl: str = "auto",
                   patch_attention_mask: Optional[jnp.ndarray] = None,
                   ) -> jnp.ndarray:
    """SigLIP tower: patch conv, bucketized pos embeds, pre-LN blocks with
    gelu_tanh MLP, final post_layernorm.

    ``patch_attention_mask``: (N, gh, gw) bool/int, 1 = real patch — the
    variable-aspect path (``do_image_splitting`` / mixed-size batches pad
    bottom/right to a common shape).  None = every patch real (frames
    resized to one shape), which skips the masked kernels entirely.
    Hidden states AT padded positions are garbage-by-construction exactly
    as in transformers; the connector's cross-attention mask discards
    them (``connector_forward(context_mask=...)``).
    """
    P = cfg.patch_size
    gh = pixel_values.shape[1] // P
    gw = pixel_values.shape[2] // P
    if (gh * P, gw * P) != pixel_values.shape[1:3]:
        # torch Conv2d(kernel=stride=P) silently drops trailing rows/cols
        # that don't fill a whole patch (Idefics2 resize output sizes are
        # NOT patch-multiples in general: 1920x1080 -> 551x980); the
        # reshape-as-matmul patchify needs that crop to be explicit.
        pixel_values = pixel_values[:, :gh * P, :gw * P]
    x = patch_embed(p["patch_embedding"], pixel_values, P)
    side = cfg.image_size // cfg.patch_size
    kv_mask = None
    if patch_attention_mask is not None:
        pos_ids = masked_position_ids(
            patch_attention_mask.astype(jnp.int32), side)
        x = x + jnp.take(p["position_embedding"], pos_ids,
                         axis=0).astype(x.dtype)
        kv_mask = patch_attention_mask.reshape(
            patch_attention_mask.shape[0], gh * gw).astype(jnp.int32)
    else:
        pos_ids = _bucket_position_ids(gh, gw, side)
        x = x + p["position_embedding"][jnp.asarray(pos_ids)][None].astype(
            x.dtype)

    H, D = cfg.num_attention_heads, cfg.head_dim
    eps = cfg.layer_norm_eps

    def block(carry, lp):
        x = carry
        B, S, C = x.shape
        h = layer_norm(x, lp["ln1"]["weight"], lp["ln1"]["bias"], eps=eps)
        q = (dot(h, lp["q"]["kernel"]) + lp["q"]["bias"]).reshape(B, S, H, D)
        k = (dot(h, lp["k"]["kernel"]) + lp["k"]["bias"]).reshape(B, S, H, D)
        v = (dot(h, lp["v"]["kernel"]) + lp["v"]["bias"]).reshape(B, S, H, D)
        # Pre-LN SigLIP -> bounded q/k: the Cauchy-Schwarz softmax bound
        # is safe on the unmasked nc path (see models/vit.py); the masked
        # variable-aspect path takes the general kernel, where it's a no-op.
        attn = multi_head_attention(q, k, v, causal=False, impl=attn_impl,
                                    attention_mask=kv_mask,
                                    norm_bound=True).reshape(B, S, C)
        x = x + dot(attn, lp["o"]["kernel"]) + lp["o"]["bias"]
        h = layer_norm(x, lp["ln2"]["weight"], lp["ln2"]["bias"], eps=eps)
        h = dot(h, lp["fc1"]["kernel"]) + lp["fc1"]["bias"]
        h = jax.nn.gelu(h, approximate=True)  # gelu_pytorch_tanh
        h = dot(h, lp["fc2"]["kernel"]) + lp["fc2"]["bias"]
        return x + h, None

    from ..ops.remat import remat_wrap

    blk = remat_wrap(block, remat)
    x, _ = jax.lax.scan(blk, x, p["layers"])
    return layer_norm(x, p["post_layernorm"]["weight"],
                      p["post_layernorm"]["bias"], eps=eps)


def connector_forward(p, cfg: PerceiverConfig, vision_hidden: jnp.ndarray,
                      eps_override: Optional[float] = None,
                      context_mask: Optional[jnp.ndarray] = None,
                      ) -> jnp.ndarray:
    """Modality projection + perceiver resampler.

    vision_hidden: (N_images, S, C_text-after-projection-input) — projected
    to the text width, then compressed to ``n_latents`` tokens per image.
    ``context_mask``: (N_images, S) 1 = real patch (transformers
    ``Idefics2PerceiverResampler.forward`` concatenates the patch mask
    with all-ones latent positions) — how padded-patch garbage from the
    masked vision tower is kept out of the latents.
    """
    eps = eps_override or cfg.rms_norm_eps
    x = _mlp_silu(p["modality_projection"], vision_hidden)
    B = x.shape[0]
    latents = jnp.broadcast_to(
        p["latents"][None], (B,) + p["latents"].shape
    ).astype(x.dtype)

    Hq, Hkv, D = cfg.n_heads, cfg.num_key_value_heads, cfg.head_dim
    kv_mask = None
    if context_mask is not None:
        kv_mask = jnp.concatenate(
            [context_mask.astype(jnp.int32),
             jnp.ones((B, p["latents"].shape[0]), jnp.int32)], axis=1)

    def layer(latents, lp):
        ln_lat = rms_norm(latents, lp["ln_latents"]["weight"], eps=eps)
        ln_ctx = rms_norm(x, lp["ln_context"]["weight"], eps=eps)
        kv_in = jnp.concatenate([ln_ctx, ln_lat], axis=1)
        nq, nkv = ln_lat.shape[1], kv_in.shape[1]
        q = dot(ln_lat, lp["q"]["kernel"]).reshape(B, nq, Hq, D)
        k = dot(kv_in, lp["k"]["kernel"]).reshape(B, nkv, Hkv, D)
        v = dot(kv_in, lp["v"]["kernel"]).reshape(B, nkv, Hkv, D)
        attn = multi_head_attention(q, k, v, causal=False, impl="xla",
                                    attention_mask=kv_mask)
        latents = latents + dot(attn.reshape(B, nq, Hq * D),
                                lp["o"]["kernel"])
        h = rms_norm(latents, lp["ln_post"]["weight"], eps=eps)
        return latents + _mlp_silu(
            {"gate": lp["gate"], "up": lp["up"], "down": lp["down"]}, h
        ), None

    latents, _ = jax.lax.scan(layer, latents, p["layers"])
    return rms_norm(latents, p["norm"]["weight"], eps=eps)


def videoscore_forward(
    params, cfg: VideoScoreConfig,
    pixel_values: jnp.ndarray,  # (N_images, H, W, 3) NHWC, preprocessed
    input_ids: jnp.ndarray,  # (B, T) with image_token_id runs
    attention_mask: Optional[jnp.ndarray] = None,
    attn_impl: str = "auto",
    pixel_attention_mask: Optional[jnp.ndarray] = None,  # (N, H, W)
) -> jnp.ndarray:
    """Full Idefics2 forward -> (B, num_labels) regression logits.

    VideoScore semantics (``eval_genai_videoScore.py``): the 5 aspect scores
    come out of one forward; callers sum them (``VideoScoreJudge.aggregate``).
    ``pixel_attention_mask`` (1 = real pixel, bottom/right zero padding)
    activates the variable-aspect path: the patch mask is its patch-grid
    any-pool (transformers ``Idefics2Model.forward`` unfold+sum>0), masking
    vision self-attention, position-id bucketing, and the perceiver's
    cross-attention context.
    """
    patch_mask = ctx_mask = None
    if pixel_attention_mask is not None:
        P = cfg.vision.patch_size
        N, Hp, Wp = pixel_attention_mask.shape
        gh, gw = Hp // P, Wp // P
        # crop to whole patches exactly as the vision tower's patchify does
        # (transformers pools the mask with unfold(step=P), which floors)
        grid = pixel_attention_mask[:, :gh * P, :gw * P].reshape(
            N, gh, P, gw, P)
        patch_mask = grid.sum(axis=(2, 4)) > 0  # (N, gh, gw)
        ctx_mask = patch_mask.reshape(N, -1)
    vis = vision_forward(params["vision_model"], cfg.vision, pixel_values,
                         attn_impl=attn_impl,
                         patch_attention_mask=patch_mask)
    img_tokens = connector_forward(params["connector"], cfg.perceiver, vis,
                                   context_mask=ctx_mask)

    embeds = dec.embed_tokens(params["text"], input_ids)
    embeds = scatter_image_embeds(
        embeds, input_ids, img_tokens, cfg.image_token_id
    )
    hidden = dec.decoder_forward(
        params["text"], cfg.text, embeds, attention_mask=attention_mask,
        attn_impl=attn_impl, remat=False,
    )
    T = input_ids.shape[-1]
    idx = (
        jnp.argmax((input_ids == cfg.text.pad_token_id).astype(jnp.int32), -1)
        - 1
    ) % T
    pooled = jnp.take_along_axis(hidden, idx[:, None, None], axis=1,
                                 mode="clip")[:, 0]
    return dot_f32(pooled, params["score"]["kernel"])
