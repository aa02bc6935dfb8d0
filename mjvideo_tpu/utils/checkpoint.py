"""Checkpoint I/O: safetensors importer (reference weights) + orbax native.

Importer maps the reference's published parameter names onto our pytree
schema so MJ-VIDEO-2B weights load directly (SURVEY.md §7.1 step 1):

* ``vision_model.*``           (``modeling_intern_vit.py``)
* ``language_model.*``         (``modeling_internlm2.py`` — packed ``wqkv``
  grouped layout '(h gs d)', gs = 2 + groups, ``:301-305,361-371``, is
  unpacked ONCE here into separate q/k/v kernels)
* ``mlp1.{0,1,3}.*``           (``modeling_internvl_chat.py:135-140``)
* ``regression_layer`` / ``reward_transform_matrix`` / ``aspect_gating`` /
  ``criteria_gating``          (``moe_reward.py:137-181``)

All torch ``nn.Linear`` weights are (out, in) and transpose to (in, out)
kernels; per-layer tensors stack along a leading L axis for ``lax.scan``.

Native checkpointing (training) uses orbax; resume is exact because data
order is deterministic (SURVEY.md §5 checkpoint/resume row).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..configs import ChatConfig, LLMConfig, RewardConfig, VisionConfig


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load all *.safetensors under a directory (or a single file) as numpy."""
    from safetensors import safe_open

    files: List[str]
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".safetensors")
        )
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no safetensors found at {path}")
    state: Dict[str, np.ndarray] = {}
    for f in files:
        with safe_open(f, framework="numpy") as sf:
            for key in sf.keys():
                state[key] = sf.get_tensor(key)
    return state


def _k(t: np.ndarray, dtype) -> jnp.ndarray:
    """torch Linear weight (out, in) -> kernel (in, out)."""
    return jnp.asarray(np.ascontiguousarray(t.T)).astype(dtype)


def _a(t: np.ndarray, dtype) -> jnp.ndarray:
    return jnp.asarray(t).astype(dtype)


def _stack(tensors: List[np.ndarray]) -> np.ndarray:
    return np.stack(tensors, axis=0)


def import_vit_params(
    state: Dict[str, np.ndarray], cfg: VisionConfig, dtype=jnp.float32,
    prefix: str = "vision_model.",
) -> Dict[str, Any]:
    """Map InternViT torch names -> our stacked-layer pytree."""
    g = lambda name: state[prefix + name]  # noqa: E731
    L = cfg.num_hidden_layers
    P = cfg.patch_size

    # Conv2d (C_out, C_in, kh, kw) -> (kh*kw*C_in, C_out) matching patch_embed
    # (ph, pw, channel) flattening.
    conv = g("embeddings.patch_embedding.weight")
    conv = conv.transpose(2, 3, 1, 0).reshape(P * P * 3, -1)

    def per_layer(name):
        return _stack([g(f"encoder.layers.{i}.{name}") for i in range(L)])

    layers: Dict[str, Any] = {
        "norm1": {"weight": _a(per_layer("norm1.weight"), dtype)},
        "norm2": {"weight": _a(per_layer("norm2.weight"), dtype)},
        "attn": {
            "qkv": {
                "kernel": _a(
                    per_layer("attn.qkv.weight").transpose(0, 2, 1), dtype
                ),
            },
            "proj": {
                "kernel": _a(
                    per_layer("attn.proj.weight").transpose(0, 2, 1), dtype
                ),
                "bias": _a(per_layer("attn.proj.bias"), dtype),
            },
        },
        "mlp": {
            "fc1": {
                "kernel": _a(per_layer("mlp.fc1.weight").transpose(0, 2, 1),
                             dtype),
                "bias": _a(per_layer("mlp.fc1.bias"), dtype),
            },
            "fc2": {
                "kernel": _a(per_layer("mlp.fc2.weight").transpose(0, 2, 1),
                             dtype),
                "bias": _a(per_layer("mlp.fc2.bias"), dtype),
            },
        },
        "ls1": _a(per_layer("ls1"), dtype),
        "ls2": _a(per_layer("ls2"), dtype),
    }
    if cfg.norm_type != "rms_norm":
        layers["norm1"]["bias"] = _a(per_layer("norm1.bias"), dtype)
        layers["norm2"]["bias"] = _a(per_layer("norm2.bias"), dtype)
    if cfg.qkv_bias:
        layers["attn"]["qkv"]["bias"] = _a(per_layer("attn.qkv.bias"), dtype)
    if cfg.qk_normalization:
        layers["attn"]["q_norm"] = {
            "weight": _a(per_layer("attn.q_norm.weight"), dtype)
        }
        layers["attn"]["k_norm"] = {
            "weight": _a(per_layer("attn.k_norm.weight"), dtype)
        }

    return {
        "embeddings": {
            "class_embedding": _a(g("embeddings.class_embedding"), dtype),
            "patch_embedding": {
                "kernel": _a(conv, dtype),
                "bias": _a(g("embeddings.patch_embedding.bias"), dtype),
            },
            "position_embedding": _a(g("embeddings.position_embedding"),
                                     dtype),
        },
        "layers": layers,
    }


def unpack_wqkv(
    w: np.ndarray, cfg: LLMConfig
) -> Dict[str, np.ndarray]:
    """Split a packed wqkv weight (out, in) into q/k/v kernels (in, out).

    Layout per ``modeling_internlm2.py:361-371``: out dim = (h, gs, d) with
    h = num_key_value_heads, gs = 2 + groups; slots [0..G) are q heads,
    slot -2 is k, slot -1 is v.
    """
    Hkv, G, D = (
        cfg.num_key_value_heads, cfg.num_key_value_groups, cfg.head_dim,
    )
    C = w.shape[1]
    w = w.reshape(Hkv, G + 2, D, C)
    q = w[:, :G].reshape(Hkv * G * D, C)
    k = w[:, -2].reshape(Hkv * D, C)
    v = w[:, -1].reshape(Hkv * D, C)
    return {"q": q.T, "k": k.T, "v": v.T}


def _llama_attention(g, cfg: LLMConfig, L: int, per_layer_t, dtype):
    """Llama-family attention kernels, with optional QKV biases.

    Qwen2 (MiniCPM-V-2.6's LLM) carries q/k/v biases but no o_proj bias —
    a missing bias imports as zeros, which is exact."""
    attn = {
        "wq": {"kernel": per_layer_t("self_attn.q_proj")},
        "wk": {"kernel": per_layer_t("self_attn.k_proj")},
        "wv": {"kernel": per_layer_t("self_attn.v_proj")},
        "wo": {"kernel": per_layer_t("self_attn.o_proj")},
    }
    if cfg.bias:
        def per_layer_b(name, width, allow_missing=False):
            # Zero-fill is only exact for o_proj (the one bias the Qwen2
            # layout legitimately lacks); missing q/k/v biases mean a
            # truncated/mis-prefixed checkpoint and must fail loudly.
            rows = []
            for i in range(L):
                try:
                    rows.append(g(f"model.layers.{i}.{name}.bias"))
                except KeyError:
                    if not allow_missing:
                        raise
                    rows.append(np.zeros((width,), np.float32))
            return _a(_stack(rows), dtype)

        Hq, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.head_dim)
        attn["wq"]["bias"] = per_layer_b("self_attn.q_proj", Hq * D)
        attn["wk"]["bias"] = per_layer_b("self_attn.k_proj", Hkv * D)
        attn["wv"]["bias"] = per_layer_b("self_attn.v_proj", Hkv * D)
        attn["wo"]["bias"] = per_layer_b("self_attn.o_proj", cfg.hidden_size,
                                         allow_missing=True)
    return attn


def import_siglip_vision(
    state: Dict[str, np.ndarray], cfg, dtype=jnp.float32,
    prefix: str = "vision_model.",
) -> Dict[str, Any]:
    """Map a SigLIP vision tower state dict onto our pytree.

    Shared by the Idefics2/VideoScore port (``models/videoscore.py``,
    prefix ``vision_model.``) and MiniCPM-V-2.6 (prefix ``vpm.`` — its
    NaViT-adapted SigLIP is the same so400m architecture).  ``cfg`` is a
    ``videoscore.SigLIPVisionConfig``.
    """
    g = lambda name: state[prefix + name]  # noqa: E731

    conv = np.asarray(g("embeddings.patch_embedding.weight"))
    P = cfg.patch_size
    conv = conv.transpose(2, 3, 1, 0).reshape(P * P * 3, -1)

    def v_stack(name, transpose=False):
        ts = [np.asarray(g(f"encoder.layers.{i}.{name}"))
              for i in range(cfg.num_hidden_layers)]
        arr = np.stack(ts)
        if transpose:
            arr = arr.transpose(0, 2, 1)
        return _a(arr, dtype)

    return {
        "patch_embedding": {
            "kernel": _a(conv, dtype),
            "bias": _a(g("embeddings.patch_embedding.bias"), dtype),
        },
        "position_embedding": _a(
            g("embeddings.position_embedding.weight"), dtype),
        "layers": {
            "ln1": {"weight": v_stack("layer_norm1.weight"),
                    "bias": v_stack("layer_norm1.bias")},
            "ln2": {"weight": v_stack("layer_norm2.weight"),
                    "bias": v_stack("layer_norm2.bias")},
            "q": {"kernel": v_stack("self_attn.q_proj.weight", True),
                  "bias": v_stack("self_attn.q_proj.bias")},
            "k": {"kernel": v_stack("self_attn.k_proj.weight", True),
                  "bias": v_stack("self_attn.k_proj.bias")},
            "v": {"kernel": v_stack("self_attn.v_proj.weight", True),
                  "bias": v_stack("self_attn.v_proj.bias")},
            "o": {"kernel": v_stack("self_attn.out_proj.weight", True),
                  "bias": v_stack("self_attn.out_proj.bias")},
            "fc1": {"kernel": v_stack("mlp.fc1.weight", True),
                    "bias": v_stack("mlp.fc1.bias")},
            "fc2": {"kernel": v_stack("mlp.fc2.weight", True),
                    "bias": v_stack("mlp.fc2.bias")},
        },
        "post_layernorm": {
            "weight": _a(g("post_layernorm.weight"), dtype),
            "bias": _a(g("post_layernorm.bias"), dtype),
        },
    }


def import_decoder_params(
    state: Dict[str, np.ndarray], cfg: LLMConfig, dtype=jnp.float32,
    prefix: str = "language_model.",
    with_lm_head: bool = True,
) -> Dict[str, Any]:
    """Map InternLM2/Llama torch names -> our stacked-layer pytree."""
    g = lambda name: state[prefix + name]  # noqa: E731
    L = cfg.num_hidden_layers

    if cfg.architecture == "internlm2":
        qs, ks, vs = [], [], []
        for i in range(L):
            parts = unpack_wqkv(g(f"model.layers.{i}.attention.wqkv.weight"),
                                cfg)
            qs.append(parts["q"])
            ks.append(parts["k"])
            vs.append(parts["v"])
        attn = {
            "wq": {"kernel": _a(_stack(qs), dtype)},
            "wk": {"kernel": _a(_stack(ks), dtype)},
            "wv": {"kernel": _a(_stack(vs), dtype)},
            "wo": {
                "kernel": _a(
                    _stack([
                        g(f"model.layers.{i}.attention.wo.weight")
                        for i in range(L)
                    ]).transpose(0, 2, 1),
                    dtype,
                )
            },
        }
        if cfg.bias:
            # Packed bias splits identically to the weight.
            qbs, kbs, vbs = [], [], []
            for i in range(L):
                b = g(f"model.layers.{i}.attention.wqkv.bias")
                parts = unpack_wqkv(b[:, None], cfg)
                qbs.append(parts["q"][0])
                kbs.append(parts["k"][0])
                vbs.append(parts["v"][0])
            attn["wq"]["bias"] = _a(_stack(qbs), dtype)
            attn["wk"]["bias"] = _a(_stack(kbs), dtype)
            attn["wv"]["bias"] = _a(_stack(vbs), dtype)
            attn["wo"]["bias"] = _a(
                _stack([g(f"model.layers.{i}.attention.wo.bias")
                        for i in range(L)]),
                dtype,
            )

        def ff(name):
            return _a(
                _stack([
                    g(f"model.layers.{i}.feed_forward.{name}.weight")
                    for i in range(L)
                ]).transpose(0, 2, 1),
                dtype,
            )

        layers = {
            "attention_norm": {
                "weight": _a(
                    _stack([g(f"model.layers.{i}.attention_norm.weight")
                            for i in range(L)]),
                    dtype,
                )
            },
            "attention": attn,
            "ffn_norm": {
                "weight": _a(
                    _stack([g(f"model.layers.{i}.ffn_norm.weight")
                            for i in range(L)]),
                    dtype,
                )
            },
            "feed_forward": {
                "w1": {"kernel": ff("w1")},
                "w3": {"kernel": ff("w3")},
                "w2": {"kernel": ff("w2")},
            },
        }
        embed = g("model.tok_embeddings.weight")
        final_norm = g("model.norm.weight")
        lm_head_key = "output.weight"
    elif cfg.architecture == "llama":
        def per_layer_t(name):
            return _a(
                _stack([g(f"model.layers.{i}.{name}.weight")
                        for i in range(L)]).transpose(0, 2, 1),
                dtype,
            )

        layers = {
            "attention_norm": {
                "weight": _a(
                    _stack([g(f"model.layers.{i}.input_layernorm.weight")
                            for i in range(L)]),
                    dtype,
                )
            },
            "attention": _llama_attention(g, cfg, L, per_layer_t, dtype),
            "ffn_norm": {
                "weight": _a(
                    _stack([
                        g(f"model.layers.{i}.post_attention_layernorm.weight")
                        for i in range(L)
                    ]),
                    dtype,
                )
            },
            "feed_forward": {
                "w1": {"kernel": per_layer_t("mlp.gate_proj")},
                "w3": {"kernel": per_layer_t("mlp.up_proj")},
                "w2": {"kernel": per_layer_t("mlp.down_proj")},
            },
        }
        embed = g("model.embed_tokens.weight")
        final_norm = g("model.norm.weight")
        lm_head_key = "lm_head.weight"
    elif cfg.architecture == "phi3":
        # Phi-3 packs qkv_proj as [q (Hq*D); k (Hkv*D); v (Hkv*D)] rows and
        # gate_up_proj as [gate (I); up (I)] rows.
        Hq, Hkv, D, I = (cfg.num_attention_heads, cfg.num_key_value_heads,
                         cfg.head_dim, cfg.intermediate_size)
        qs, ks, vs, gates, ups = [], [], [], [], []
        for i in range(L):
            qkv = g(f"model.layers.{i}.self_attn.qkv_proj.weight")
            qs.append(qkv[: Hq * D].T)
            ks.append(qkv[Hq * D: Hq * D + Hkv * D].T)
            vs.append(qkv[Hq * D + Hkv * D:].T)
            gu = g(f"model.layers.{i}.mlp.gate_up_proj.weight")
            gates.append(gu[:I].T)
            ups.append(gu[I:].T)
        layers = {
            "attention_norm": {
                "weight": _a(
                    _stack([g(f"model.layers.{i}.input_layernorm.weight")
                            for i in range(L)]),
                    dtype,
                )
            },
            "attention": {
                "wq": {"kernel": _a(_stack(qs), dtype)},
                "wk": {"kernel": _a(_stack(ks), dtype)},
                "wv": {"kernel": _a(_stack(vs), dtype)},
                "wo": {
                    "kernel": _a(
                        _stack([
                            g(f"model.layers.{i}.self_attn.o_proj.weight")
                            for i in range(L)
                        ]).transpose(0, 2, 1),
                        dtype,
                    )
                },
            },
            "ffn_norm": {
                "weight": _a(
                    _stack([
                        g(f"model.layers.{i}.post_attention_layernorm.weight")
                        for i in range(L)
                    ]),
                    dtype,
                )
            },
            "feed_forward": {
                "w1": {"kernel": _a(_stack(gates), dtype)},
                "w3": {"kernel": _a(_stack(ups), dtype)},
                "w2": {
                    "kernel": _a(
                        _stack([
                            g(f"model.layers.{i}.mlp.down_proj.weight")
                            for i in range(L)
                        ]).transpose(0, 2, 1),
                        dtype,
                    )
                },
            },
        }
        embed = g("model.embed_tokens.weight")
        final_norm = g("model.norm.weight")
        lm_head_key = "lm_head.weight"
    else:
        raise ValueError(f"unknown architecture {cfg.architecture!r}")

    params: Dict[str, Any] = {
        "tok_embeddings": _a(embed, dtype),
        "layers": layers,
        "norm": {"weight": _a(final_norm, dtype)},
    }
    if with_lm_head:
        if (prefix + lm_head_key) not in state:
            # Fail HERE, not as a KeyError('output') deep inside a jitted
            # generation forward: a mis-prefixed/truncated checkpoint (or
            # a tied-embedding variant routed through this importer —
            # tied models carry their own importers, e.g. qwen2vl's)
            # should not "load successfully" without its lm head.
            raise KeyError(
                f"with_lm_head=True but {prefix + lm_head_key!r} is not in "
                f"the checkpoint ({len(state)} tensors, prefix "
                f"{prefix!r}); pass with_lm_head=False for score-only "
                "trees, or check the prefix")
        params["output"] = {"kernel": _k(g(lm_head_key), dtype)}
    return params


def import_projector_params(
    state: Dict[str, np.ndarray], dtype=jnp.float32, prefix: str = "mlp1.",
) -> Dict[str, Any]:
    """mlp1 Sequential: 0=LayerNorm, 1=Linear, 3=Linear
    (``modeling_internvl_chat.py:135-140``)."""
    g = lambda name: state[prefix + name]  # noqa: E731
    return {
        "norm": {"weight": _a(g("0.weight"), dtype),
                 "bias": _a(g("0.bias"), dtype)},
        "fc1": {"kernel": _k(g("1.weight"), dtype),
                "bias": _a(g("1.bias"), dtype)},
        "fc2": {"kernel": _k(g("3.weight"), dtype),
                "bias": _a(g("3.bias"), dtype)},
    }


def import_chat_params(
    state: Dict[str, np.ndarray], cfg: ChatConfig, dtype=jnp.float32,
    prefix: str = "", with_lm_head: bool = True,
) -> Dict[str, Any]:
    return {
        "vision_model": import_vit_params(
            state, cfg.vision, dtype, prefix=prefix + "vision_model."
        ),
        "mlp1": import_projector_params(state, dtype, prefix=prefix + "mlp1."),
        "language_model": import_decoder_params(
            state, cfg.llm, dtype, prefix=prefix + "language_model.",
            with_lm_head=with_lm_head,
        ),
    }


def _import_gating(
    state: Dict[str, np.ndarray], dtype, prefix: str, n_hidden: int
) -> Dict[str, Any]:
    """GatingNetwork: layers.{i}.weight/bias ModuleList + logit_scale
    (``moe_reward.py:16-27``)."""
    g = lambda name: state[prefix + name]  # noqa: E731
    p: Dict[str, Any] = {}
    for i in range(n_hidden + 1):
        p[f"layer_{i}"] = {
            "kernel": _k(g(f"layers.{i}.weight"), dtype),
            "bias": _a(g(f"layers.{i}.bias"), dtype),
        }
    p["logit_scale"] = _a(g("logit_scale"), dtype)
    return p


def import_reward_checkpoint(
    state: Dict[str, np.ndarray], cfg: RewardConfig, dtype=jnp.float32,
) -> Dict[str, Any]:
    """Full InternVLChatRewardModeling state_dict -> reward param pytree.

    The backbone lives under the ``model.`` prefix (``moe_reward.py:142``);
    the reward head at top level.  The reward path never uses the LM head, so
    ``output.weight`` is skipped if present.
    """
    return {
        "model": import_chat_params(
            state, cfg.chat, dtype, prefix="model.", with_lm_head=False
        ),
        "regression_layer": {
            "kernel": _k(state["regression_layer.weight"], dtype)
        },
        "reward_transform_matrix": _a(state["reward_transform_matrix"], dtype),
        "aspect_gating": _import_gating(
            state, dtype, "aspect_gating.", cfg.gating_n_hidden
        ),
        "criteria_gating": _import_gating(
            state, dtype, "criteria_gating.", cfg.gating_n_hidden
        ),
    }


def load_reward_model(
    checkpoint_path: str, cfg: Optional[RewardConfig] = None,
    dtype=jnp.bfloat16,
):
    """Convenience: (config.json +) safetensors dir -> (cfg, params)."""
    from ..configs import load_config

    if cfg is None:
        cfg = load_config(os.path.join(checkpoint_path, "config.json"))
    state = load_safetensors_dir(checkpoint_path)
    return cfg, import_reward_checkpoint(state, cfg, dtype)


# --- orbax native checkpointing ---------------------------------------------

_ASYNC_CKPTR = None


def save_pytree(path: str, tree: Any, block: bool = True) -> None:
    """Save a pytree with orbax.

    ``block=False`` uses a persistent AsyncCheckpointer: the call returns
    once the in-memory snapshot is taken and the directory write proceeds
    in the background (orbax's ``StandardCheckpointer`` IS async; the
    blocking path simply waits via the context manager).  Callers must
    ``wait_for_saves()`` before reading, deleting, or re-writing the
    path — ``Trainer`` does this around rotation and resume.  Pass tree
    values as HOST arrays when the training step donates its device
    buffers (a background reference to a donated jax.Array would read a
    deleted buffer).
    """
    import orbax.checkpoint as ocp

    if block:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(path), tree, force=True)
        return
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.StandardCheckpointer()
        # Flush before interpreter teardown: orbax's background commit
        # cannot schedule work once Python finalization starts.
        import atexit

        atexit.register(wait_for_saves)
    _ASYNC_CKPTR.save(os.path.abspath(path), tree, force=True)


def wait_for_saves() -> None:
    """Block until every ``save_pytree(..., block=False)`` has committed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def restore_pytree(path: str, like: Optional[Any] = None) -> Any:
    """Restore a pytree saved by ``save_pytree``.

    Without ``like``, orbax returns registered-dataclass nodes as plain
    dicts; QuantKernel leaves of a w8a8 tree (``ops/quant.py``) and
    LoraKernel leaves of an adapter tree (``ops/lora.py``) are revived so
    a restored checkpoint keeps its matmul dispatch."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if like is None:
            from ..ops.lora import revive_lora_kernels
            from ..ops.quant import revive_quant_kernels

            return revive_quant_kernels(
                revive_lora_kernels(ckptr.restore(os.path.abspath(path))))
        return ckptr.restore(os.path.abspath(path), like)
