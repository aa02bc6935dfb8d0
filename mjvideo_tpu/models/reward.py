"""MoE-structured video reward model.

Replaces ``scripts/model/moe_reward.py`` (GatingNetwork,
InternVLChatRewardModeling, CustomOutput).  The whole head — last-token
pooling, 28-criteria regression, both gating MLPs, per-aspect grouped softmax
routing, and the weighted sums — is one fused XLA graph appended to the
backbone forward.  Two reference warts are fixed TPU-side:

* The gating-token search (``moe_reward.py:242`` does per-row ``.tolist()`` —
  a D2H sync mid-forward) is computed at tokenization time on the host and
  passed in as an integer index (see ``data.prompts.find_gating_position``).
* The "MoE" is dense (routing is a weighted sum, not sparse dispatch —
  SURVEY §2.2), so everything stays one jit region; no expert parallelism.

Head math runs in fp32 regardless of backbone dtype (the reference implicitly
mixes bf16 rewards into an fp32 ``aspect_scores`` buffer at
``moe_reward.py:262``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..configs import RewardConfig
from ..ops.matmul import dot, dot_f32
from .internvl import chat_forward, init_chat_params


class RewardOutput(NamedTuple):
    """Functional equivalent of ``CustomOutput`` (``moe_reward.py:60-89``)."""

    rewards: jnp.ndarray  # (B, num_objectives)
    hidden_state: jnp.ndarray  # (B, hidden) pooled last-non-pad hidden
    prompt_embedding: jnp.ndarray  # (B, hidden) at the gating token
    criteria_gating_output: jnp.ndarray  # (B, num_objectives) pre-softmax
    aspect_gating_output: jnp.ndarray  # (B, num_aspects) softmaxed gate
    aspect_weights: jnp.ndarray  # (B, num_objectives) grouped-softmax weights
    aspect_scores: jnp.ndarray  # (B, num_aspects)
    score: jnp.ndarray  # (B,)


def init_gating_params(key, in_features: int, out_features: int,
                       hidden_dim: int, n_hidden: int, dtype=jnp.float32):
    """n_hidden ReLU layers + linear head + learnable logit_scale.

    Reference: ``moe_reward.py:16-27``.
    """
    keys = jax.random.split(key, n_hidden + 1)
    layers = {}
    fan_in = in_features
    for i in range(n_hidden):
        layers[f"layer_{i}"] = {
            "kernel": (jax.random.normal(keys[i], (fan_in, hidden_dim)) * 0.02
                       ).astype(dtype),
            "bias": jnp.zeros((hidden_dim,), dtype),
        }
        fan_in = hidden_dim
    layers[f"layer_{n_hidden}"] = {
        "kernel": (jax.random.normal(keys[-1], (fan_in, out_features)) * 0.02
                   ).astype(dtype),
        "bias": jnp.zeros((out_features,), dtype),
    }
    layers["logit_scale"] = jnp.ones((1,), dtype)
    return layers


def init_reward_params(key, cfg: RewardConfig, dtype=jnp.float32):
    kb, kr, ka, kc = jax.random.split(key, 4)
    C = cfg.hidden_size
    eye = jnp.eye(cfg.num_objectives, dtype=dtype)
    return {
        "model": init_chat_params(kb, cfg.chat, dtype, with_lm_head=False),
        "regression_layer": {
            "kernel": (jax.random.normal(kr, (C, cfg.num_objectives)) * 0.02
                       ).astype(dtype)
        },
        # Frozen identity; kept for checkpoint parity (``moe_reward.py:163-166``).
        "reward_transform_matrix": eye,
        "aspect_gating": init_gating_params(
            ka, C, cfg.num_aspects, cfg.gating_hidden_dim, cfg.gating_n_hidden,
            dtype,
        ),
        "criteria_gating": init_gating_params(
            kc, C, cfg.num_objectives, cfg.gating_hidden_dim,
            cfg.gating_n_hidden, dtype,
        ),
    }


def gating_mlp(p, x: jnp.ndarray, n_hidden: int) -> jnp.ndarray:
    """The shared MLP trunk: ReLU on all but the last layer (no softmax).

    Equivalent to ``GatingNetwork.forward_wo_softmax`` (``moe_reward.py:37-42``).
    """
    for i in range(n_hidden + 1):
        lp = p[f"layer_{i}"]
        x = dot(x, lp["kernel"]) + lp["bias"]
        if i < n_hidden:
            x = jax.nn.relu(x)
    return x


def gating_forward(p, x: jnp.ndarray, temperature: float,
                   n_hidden: int) -> jnp.ndarray:
    """MLP -> softmax(x/T) * logit_scale (``moe_reward.py:29-35``)."""
    logits = gating_mlp(p, x, n_hidden)
    return jax.nn.softmax(logits / temperature, axis=-1) * p["logit_scale"][0]


def pool_last_non_pad(hidden: jnp.ndarray, input_ids: jnp.ndarray,
                      pad_token_id: int) -> jnp.ndarray:
    """Pool the hidden state of the last non-pad token.

    In-graph equivalent of ``moe_reward.py:224-237``:
    ``argmax(ids == pad) - 1 (mod T)`` — if no pad exists argmax returns 0,
    so the index wraps to T-1 (the last token), matching torch.
    """
    T = input_ids.shape[-1]
    seq_len = (
        jnp.argmax((input_ids == pad_token_id).astype(jnp.int32), axis=-1) - 1
    ) % T
    return jnp.take_along_axis(
        hidden, seq_len[:, None, None], axis=1, mode="clip"
    ).squeeze(1)


def reward_head(
    params, cfg: RewardConfig,
    hidden: jnp.ndarray,  # (B, T, C) final backbone hidden states
    input_ids: jnp.ndarray,  # (B, T)
    gating_pos: jnp.ndarray,  # (B,) int — host-computed gating-token index
) -> RewardOutput:
    """The fused reward head (``moe_reward.py:211-297``)."""
    f32 = jnp.float32
    pooled = pool_last_non_pad(
        hidden, input_ids, cfg.chat.llm.pad_token_id
    ).astype(f32)

    rewards = dot_f32(pooled, params["regression_layer"]["kernel"].astype(f32))
    rewards = dot_f32(rewards, params["reward_transform_matrix"].astype(f32))

    # mode='clip': a malformed host-computed index degrades to a wrong-but-
    # finite embedding instead of NaN-poisoning the whole score.
    prompt_embedding = jnp.take_along_axis(
        hidden, gating_pos[:, None, None], axis=1, mode="clip"
    ).squeeze(1).astype(f32)

    ag = jax.tree.map(lambda a: a.astype(f32), params["aspect_gating"])
    cg = jax.tree.map(lambda a: a.astype(f32), params["criteria_gating"])

    aspect_gate = gating_forward(
        ag, prompt_embedding, cfg.gating_temperature, cfg.gating_n_hidden
    )  # (B, num_aspects)
    criteria_logits = gating_mlp(
        cg, prompt_embedding, cfg.gating_n_hidden
    )  # (B, num_objectives)

    # Per-aspect grouped softmax over each aspect's criteria slice, sharing the
    # criteria gate's temperature and logit_scale (``moe_reward.py:249-258``).
    logit_scale = cg["logit_scale"][0]
    temp = cfg.gating_temperature
    weights_groups = []
    score_groups = []
    for criteria in cfg.aspect2criteria:
        idx = jnp.asarray(criteria)
        grp = jax.nn.softmax(criteria_logits[:, idx] / temp, axis=-1) * logit_scale
        weights_groups.append(grp)
        score_groups.append(jnp.sum(rewards[:, idx] * grp, axis=-1))

    aspect_weights = jnp.concatenate(weights_groups, axis=-1)
    aspect_scores = jnp.stack(score_groups, axis=-1)  # (B, num_aspects)
    score = jnp.sum(aspect_scores * aspect_gate, axis=-1)

    return RewardOutput(
        rewards=rewards,
        hidden_state=pooled,
        prompt_embedding=prompt_embedding,
        criteria_gating_output=criteria_logits,
        aspect_gating_output=aspect_gate,
        aspect_weights=aspect_weights,
        aspect_scores=aspect_scores,
        score=score,
    )


def reward_forward(
    params,
    cfg: RewardConfig,
    pixel_values: jnp.ndarray,  # (P, H, W, 3)
    input_ids: jnp.ndarray,  # (B, T)
    attention_mask: Optional[jnp.ndarray],  # (B, T)
    gating_pos: jnp.ndarray,  # (B,)
    attn_impl: str = "auto",
    remat: bool = True,
    vit_rng=None,
    img_context_token_id: Optional[int] = None,
    sp=None,
) -> RewardOutput:
    """Backbone forward + fused reward head; the north-star inference path.

    ``vit_rng`` enables ViT DropPath/dropout (training mode) when the vision
    config carries nonzero rates; None = deterministic eval.

    ``img_context_token_id``: runtime override of the scatter token id —
    the reference sets it from the TOKENIZER at load time
    (``eval_genai_mjvideo.py``/README quickstart:
    ``model.img_context_token_id = tokenizer.convert_tokens_to_ids(...)``),
    so callers holding a tokenizer should pass its id; None = config value.

    ``sp``: sequence-parallel spec forwarded to the decoder
    (``chat_forward``/``decoder_forward``) — lets the 16-32-frame x
    max_num=12 long-context configs (>40k tokens) run their LLM attention
    sharded over the mesh end to end.  The reward head's pooling/gating
    gathers are position-wise and partition under GSPMD unchanged.
    """
    hidden = chat_forward(
        params["model"], cfg.chat, pixel_values, input_ids,
        attention_mask=attention_mask, attn_impl=attn_impl, remat=remat,
        vit_rng=vit_rng, img_context_token_id=img_context_token_id, sp=sp,
    )
    return reward_head(params, cfg, hidden, input_ids, gating_pos)
