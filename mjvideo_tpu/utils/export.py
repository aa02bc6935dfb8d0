"""Export our pytree back to the reference's torch state_dict naming.

Inverse of ``utils.checkpoint``: lets weights trained in this framework be
published in the exact format ``InternVLChatRewardModeling`` loads with
``load_state_dict(strict=True)`` (``criteria_train.py:370-382``), and powers
round-trip tests of the importer.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..configs import ChatConfig, LLMConfig, RewardConfig, VisionConfig


def _w(kernel) -> np.ndarray:
    """kernel (in, out) -> torch Linear weight (out, in)."""
    return np.ascontiguousarray(np.asarray(kernel, dtype=np.float32).T)


def _n(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def pack_wqkv(q: np.ndarray, k: np.ndarray, v: np.ndarray,
              cfg: LLMConfig) -> np.ndarray:
    """q/k/v kernels (in, out) -> packed wqkv torch weight (out, in).

    Inverse of ``checkpoint.unpack_wqkv`` ('(h gs d)' layout,
    ``modeling_internlm2.py:361-371``).
    """
    Hkv, G, D = (
        cfg.num_key_value_heads, cfg.num_key_value_groups, cfg.head_dim,
    )
    C = q.shape[0]
    qt = _w(q).reshape(Hkv, G, D, C)
    kt = _w(k).reshape(Hkv, 1, D, C)
    vt = _w(v).reshape(Hkv, 1, D, C)
    packed = np.concatenate([qt, kt, vt], axis=1)  # (Hkv, G+2, D, C)
    return packed.reshape(Hkv * (G + 2) * D, C)


def export_vit(params: Dict[str, Any], cfg: VisionConfig,
               prefix: str = "vision_model.") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    emb = params["embeddings"]
    P = cfg.patch_size
    conv = _n(emb["patch_embedding"]["kernel"]).reshape(P, P, 3, -1)
    out[prefix + "embeddings.patch_embedding.weight"] = (
        conv.transpose(3, 2, 0, 1)
    )
    out[prefix + "embeddings.patch_embedding.bias"] = _n(
        emb["patch_embedding"]["bias"]
    )
    out[prefix + "embeddings.class_embedding"] = _n(emb["class_embedding"])
    out[prefix + "embeddings.position_embedding"] = _n(
        emb["position_embedding"]
    )
    lp = params["layers"]
    for i in range(cfg.num_hidden_layers):
        pre = f"{prefix}encoder.layers.{i}."
        out[pre + "norm1.weight"] = _n(lp["norm1"]["weight"][i])
        out[pre + "norm2.weight"] = _n(lp["norm2"]["weight"][i])
        if "bias" in lp["norm1"]:
            out[pre + "norm1.bias"] = _n(lp["norm1"]["bias"][i])
            out[pre + "norm2.bias"] = _n(lp["norm2"]["bias"][i])
        out[pre + "attn.qkv.weight"] = _w(lp["attn"]["qkv"]["kernel"][i])
        if "bias" in lp["attn"]["qkv"]:
            out[pre + "attn.qkv.bias"] = _n(lp["attn"]["qkv"]["bias"][i])
        out[pre + "attn.proj.weight"] = _w(lp["attn"]["proj"]["kernel"][i])
        out[pre + "attn.proj.bias"] = _n(lp["attn"]["proj"]["bias"][i])
        if "q_norm" in lp["attn"]:
            out[pre + "attn.q_norm.weight"] = _n(
                lp["attn"]["q_norm"]["weight"][i]
            )
            out[pre + "attn.k_norm.weight"] = _n(
                lp["attn"]["k_norm"]["weight"][i]
            )
        out[pre + "mlp.fc1.weight"] = _w(lp["mlp"]["fc1"]["kernel"][i])
        out[pre + "mlp.fc1.bias"] = _n(lp["mlp"]["fc1"]["bias"][i])
        out[pre + "mlp.fc2.weight"] = _w(lp["mlp"]["fc2"]["kernel"][i])
        out[pre + "mlp.fc2.bias"] = _n(lp["mlp"]["fc2"]["bias"][i])
        out[pre + "ls1"] = _n(lp["ls1"][i])
        out[pre + "ls2"] = _n(lp["ls2"][i])
    return out


def export_decoder(params: Dict[str, Any], cfg: LLMConfig,
                   prefix: str = "language_model.") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    lp = params["layers"]
    if cfg.architecture == "internlm2":
        out[prefix + "model.tok_embeddings.weight"] = _n(
            params["tok_embeddings"]
        )
        for i in range(cfg.num_hidden_layers):
            pre = f"{prefix}model.layers.{i}."
            out[pre + "attention.wqkv.weight"] = pack_wqkv(
                lp["attention"]["wq"]["kernel"][i],
                lp["attention"]["wk"]["kernel"][i],
                lp["attention"]["wv"]["kernel"][i],
                cfg,
            )
            out[pre + "attention.wo.weight"] = _w(
                lp["attention"]["wo"]["kernel"][i]
            )
            out[pre + "attention_norm.weight"] = _n(
                lp["attention_norm"]["weight"][i]
            )
            out[pre + "ffn_norm.weight"] = _n(lp["ffn_norm"]["weight"][i])
            for name in ("w1", "w2", "w3"):
                out[pre + f"feed_forward.{name}.weight"] = _w(
                    lp["feed_forward"][name]["kernel"][i]
                )
        out[prefix + "model.norm.weight"] = _n(params["norm"]["weight"])
        if "output" in params:
            out[prefix + "output.weight"] = _w(params["output"]["kernel"])
    elif cfg.architecture == "phi3":
        out[prefix + "model.embed_tokens.weight"] = _n(
            params["tok_embeddings"]
        )
        for i in range(cfg.num_hidden_layers):
            pre = f"{prefix}model.layers.{i}."
            out[pre + "self_attn.qkv_proj.weight"] = np.concatenate([
                _w(lp["attention"]["wq"]["kernel"][i]),
                _w(lp["attention"]["wk"]["kernel"][i]),
                _w(lp["attention"]["wv"]["kernel"][i]),
            ], axis=0)
            out[pre + "self_attn.o_proj.weight"] = _w(
                lp["attention"]["wo"]["kernel"][i]
            )
            out[pre + "mlp.gate_up_proj.weight"] = np.concatenate([
                _w(lp["feed_forward"]["w1"]["kernel"][i]),
                _w(lp["feed_forward"]["w3"]["kernel"][i]),
            ], axis=0)
            out[pre + "mlp.down_proj.weight"] = _w(
                lp["feed_forward"]["w2"]["kernel"][i]
            )
            out[pre + "input_layernorm.weight"] = _n(
                lp["attention_norm"]["weight"][i]
            )
            out[pre + "post_attention_layernorm.weight"] = _n(
                lp["ffn_norm"]["weight"][i]
            )
        out[prefix + "model.norm.weight"] = _n(params["norm"]["weight"])
        if "output" in params:
            out[prefix + "lm_head.weight"] = _w(params["output"]["kernel"])
    else:  # llama
        out[prefix + "model.embed_tokens.weight"] = _n(
            params["tok_embeddings"]
        )
        names = {
            "wq": "self_attn.q_proj", "wk": "self_attn.k_proj",
            "wv": "self_attn.v_proj", "wo": "self_attn.o_proj",
            "w1": "mlp.gate_proj", "w3": "mlp.up_proj", "w2": "mlp.down_proj",
        }
        for i in range(cfg.num_hidden_layers):
            pre = f"{prefix}model.layers.{i}."
            for ours, theirs in names.items():
                src = (lp["attention"] if ours.startswith("wq") or ours in
                       ("wk", "wv", "wo") else lp["feed_forward"])
                out[pre + theirs + ".weight"] = _w(src[ours]["kernel"][i])
            out[pre + "input_layernorm.weight"] = _n(
                lp["attention_norm"]["weight"][i]
            )
            out[pre + "post_attention_layernorm.weight"] = _n(
                lp["ffn_norm"]["weight"][i]
            )
        out[prefix + "model.norm.weight"] = _n(params["norm"]["weight"])
        if "output" in params:
            out[prefix + "lm_head.weight"] = _w(params["output"]["kernel"])
    return out


def export_projector(params: Dict[str, Any],
                     prefix: str = "mlp1.") -> Dict[str, np.ndarray]:
    return {
        prefix + "0.weight": _n(params["norm"]["weight"]),
        prefix + "0.bias": _n(params["norm"]["bias"]),
        prefix + "1.weight": _w(params["fc1"]["kernel"]),
        prefix + "1.bias": _n(params["fc1"]["bias"]),
        prefix + "3.weight": _w(params["fc2"]["kernel"]),
        prefix + "3.bias": _n(params["fc2"]["bias"]),
    }


def export_chat(params: Dict[str, Any], cfg: ChatConfig,
                prefix: str = "") -> Dict[str, np.ndarray]:
    out = export_vit(params["vision_model"], cfg.vision,
                     prefix + "vision_model.")
    out.update(export_projector(params["mlp1"], prefix + "mlp1."))
    out.update(export_decoder(params["language_model"], cfg.llm,
                              prefix + "language_model."))
    return out


def _export_gating(params: Dict[str, Any], prefix: str,
                   n_hidden: int) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for i in range(n_hidden + 1):
        out[prefix + f"layers.{i}.weight"] = _w(params[f"layer_{i}"]["kernel"])
        out[prefix + f"layers.{i}.bias"] = _n(params[f"layer_{i}"]["bias"])
    out[prefix + "logit_scale"] = _n(params["logit_scale"])
    return out


def export_reward_checkpoint(
    params: Dict[str, Any], cfg: RewardConfig
) -> Dict[str, np.ndarray]:
    """Full reward pytree -> reference-named state dict (numpy fp32)."""
    out = export_chat(params["model"], cfg.chat, prefix="model.")
    out["regression_layer.weight"] = _w(params["regression_layer"]["kernel"])
    out["reward_transform_matrix"] = _n(params["reward_transform_matrix"])
    out.update(_export_gating(params["aspect_gating"], "aspect_gating.",
                              cfg.gating_n_hidden))
    out.update(_export_gating(params["criteria_gating"], "criteria_gating.",
                              cfg.gating_n_hidden))
    return out


def save_safetensors(state: Dict[str, np.ndarray], path: str) -> None:
    from safetensors.numpy import save_file

    # save_file serializes the RAW buffer: a non-contiguous view (e.g. the
    # transposed patch-conv kernel from export_vit) would be written in its
    # original memory order and silently corrupt that tensor on reload
    # (caught by benchmarks/imported_weights_tpu.py's bit-exact check).
    save_file({k: np.ascontiguousarray(v) for k, v in state.items()}, path)


def save_reward_checkpoint_dir(path: str, params, cfg: RewardConfig) -> None:
    """Write an HF-format checkpoint directory (model.safetensors +
    config.json) that ``utils.checkpoint.load_reward_model`` AND the
    reference's ``from_pretrained`` flow can read back."""
    import json
    import os

    from ..configs import reward_config_to_hf

    os.makedirs(path, exist_ok=True)
    state = export_reward_checkpoint(params, cfg)
    save_safetensors(state, os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(reward_config_to_hf(cfg), f, indent=2)
