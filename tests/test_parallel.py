"""Mesh/sharding tests on the 8-virtual-CPU-device mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mjvideo_tpu.configs import tiny_test_config
from mjvideo_tpu.models.reward import init_reward_params, reward_forward
from mjvideo_tpu.parallel.mesh import (
    make_mesh,
    param_pspec,
    shard_batch,
    shard_params,
)


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config()


@pytest.fixture(scope="module")
def params(cfg):
    return init_reward_params(jax.random.PRNGKey(0), cfg)


def test_make_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    m = make_mesh()
    assert dict(m.shape) == {"data": 8, "model": 1}
    m2 = make_mesh(data=4, model=2)
    assert dict(m2.shape) == {"data": 4, "model": 2}


def test_tp_rules_cover_megatron_pairs():
    # column-parallel out dims / row-parallel in dims
    assert param_pspec("model/language_model/layers/attention/wq/kernel",
                       True) == P(None, None, "model")
    assert param_pspec("model/language_model/layers/attention/wo/kernel",
                       True) == P(None, "model", None)
    assert param_pspec("model/language_model/layers/feed_forward/w2/kernel",
                       True) == P(None, "model", None)
    assert param_pspec("model/vision_model/layers/mlp/fc1/kernel",
                       True) == P(None, None, "model")
    # everything else replicates
    assert param_pspec("regression_layer/kernel", True) == P()
    assert param_pspec("model/language_model/norm/weight", True) == P()


def _tiny_inputs(cfg, B, rng):
    c = cfg.chat
    frames = 1
    n_img = c.num_image_token * frames
    T = n_img + 12
    ids = np.full((B, T), 5, np.int64)
    ids[:, 2:2 + n_img] = c.img_context_token_id
    pix = rng.normal(size=(B * frames, c.vision.image_size,
                           c.vision.image_size, 3)).astype(np.float32)
    return (
        jnp.asarray(pix),
        jnp.asarray(ids, jnp.int32),
        jnp.ones((B, T), jnp.int32),
        jnp.full((B,), T - 4, jnp.int32),
    )


def test_dp_sharded_forward_matches_single_device(cfg, params):
    """pjit over a data=8 mesh must equal the unsharded forward."""
    rng = np.random.default_rng(0)
    B = 8
    pix, ids, mask, gpos = _tiny_inputs(cfg, B, rng)

    single = reward_forward(params, cfg, pix, ids, mask, gpos,
                            attn_impl="xla", remat=False)

    mesh = make_mesh()
    p_sh = shard_params(params, mesh)
    batch = shard_batch({"pix": pix, "ids": ids, "mask": mask,
                         "gpos": gpos}, mesh)

    @jax.jit
    def fwd(p, b):
        return reward_forward(p, cfg, b["pix"], b["ids"], b["mask"],
                              b["gpos"], attn_impl="xla", remat=False)

    out = fwd(p_sh, batch)
    np.testing.assert_allclose(
        np.asarray(out.score), np.asarray(single.score), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.rewards), np.asarray(single.rewards), atol=1e-4
    )


def test_tp_sharded_forward_matches_single_device(cfg, params):
    """data=4 x model=2 sharding must not change the math."""
    rng = np.random.default_rng(1)
    B = 4
    pix, ids, mask, gpos = _tiny_inputs(cfg, B, rng)
    single = reward_forward(params, cfg, pix, ids, mask, gpos,
                            attn_impl="xla", remat=False)

    mesh = make_mesh(data=4, model=2)
    p_sh = shard_params(params, mesh, tp=True)
    # TP rules must actually shard something on the model axis
    shardings = jax.tree.map(lambda a: a.sharding.spec, p_sh)
    wq_spec = shardings["model"]["language_model"]["layers"]["attention"][
        "wq"]["kernel"]
    assert "model" in str(wq_spec)

    @jax.jit
    def fwd(p, pix, ids, mask, gpos):
        return reward_forward(p, cfg, pix, ids, mask, gpos,
                              attn_impl="xla", remat=False)

    out = fwd(p_sh, pix, ids, mask, gpos)
    np.testing.assert_allclose(
        np.asarray(out.score), np.asarray(single.score), atol=1e-4
    )


def test_mesh_sharded_scorer_matches_unsharded(cfg, params):
    """RewardScorer with a data-parallel mesh equals the plain scorer."""
    from mjvideo_tpu.data.prompts import ByteTokenizer
    from mjvideo_tpu.eval.scorer import RewardScorer

    tok = ByteTokenizer()
    kw = dict(attn_impl="xla", dtype=jnp.float32, length_buckets=(256,),
              gating_pattern=tok.gating_pattern())
    plain = RewardScorer(cfg, params, tok, **kw)
    meshed = RewardScorer(cfg, params, tok, mesh=make_mesh(data=4, model=2),
                          **kw)

    rng = np.random.default_rng(7)
    c = cfg.chat
    n_img = c.num_image_token
    B = 4
    pixels = rng.normal(size=(B, c.vision.image_size, c.vision.image_size, 3)
                        ).astype(np.float32)
    ids_list, gpos = [], []
    for _ in range(B):
        ids = np.full((n_img + 12,), 5, np.int32)
        ids[2:2 + n_img] = c.img_context_token_id
        ids_list.append(ids)
        gpos.append(len(ids) - 4)
    a = plain.score_batch(pixels, ids_list, gpos)
    b = meshed.score_batch(pixels, ids_list, gpos)
    np.testing.assert_allclose(np.asarray(a.score), np.asarray(b.score),
                               atol=1e-4)

    # quantized serving composes with the mesh: pre-quantized trees
    # (weight-only: deterministic numerics) shard and score identically
    from mjvideo_tpu.ops.quant import quantize_params_int8

    qt = quantize_params_int8(params, min_elements=128, weight_only=True)
    q_plain = RewardScorer(cfg, qt, tok, **kw)
    q_mesh = RewardScorer(cfg, qt, tok, mesh=make_mesh(data=4, model=2),
                          **kw)
    qa = q_plain.score_batch(pixels, ids_list, gpos)
    qb = q_mesh.score_batch(pixels, ids_list, gpos)
    np.testing.assert_allclose(np.asarray(qa.score), np.asarray(qb.score),
                               atol=1e-4)


def test_sequence_parallel_attention_matches_single_device(cfg):
    """SP flash attention (q sharded, KV all-gathered, global causal offset)
    must equal single-device attention on the 8-CPU mesh."""
    from mjvideo_tpu.eval import metrics  # noqa: F401 (import side check)
    from mjvideo_tpu.ops.attention import multi_head_attention
    from mjvideo_tpu.parallel.sequence import shard_sequence, sp_flash_attention

    rng = np.random.default_rng(11)
    B, S, Hq, Hkv, D = 1, 64, 4, 2, 16
    q = jnp.asarray(rng.normal(size=(B, S, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    lens = np.array([S - 10])
    mask = jnp.asarray((np.arange(S)[None, :] < lens[:, None]).astype(np.int32))

    ref = multi_head_attention(q, k, v, attention_mask=mask, causal=True,
                               impl="xla")

    mesh = make_mesh(data=8, model=1)
    qs = shard_sequence(q, mesh)
    ks = shard_sequence(k, mesh)
    vs = shard_sequence(v, mesh)
    ms = shard_sequence(mask, mesh, dim=1)
    got = sp_flash_attention(qs, ks, vs, mesh, axis="data",
                             attention_mask=ms, causal=True)
    gotm = np.asarray(got) * np.asarray(mask)[:, :, None, None]
    refm = np.asarray(ref) * np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(gotm, refm, atol=3e-5)

    # no-mask variant
    got2 = sp_flash_attention(qs, ks, vs, mesh, axis="data", causal=True)
    ref2 = multi_head_attention(q, k, v, causal=True, impl="xla")
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), atol=3e-5)


def test_ring_attention_matches_single_device(cfg):
    """Ring attention (ppermute'd KV chunks + lse merge) == single device."""
    from mjvideo_tpu.ops.attention import multi_head_attention
    from mjvideo_tpu.parallel.sequence import (
        ring_flash_attention,
        shard_sequence,
    )

    rng = np.random.default_rng(13)
    B, S, Hq, Hkv, D = 1, 64, 4, 2, 16
    q = jnp.asarray(rng.normal(size=(B, S, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    mask = jnp.asarray((np.arange(S)[None, :] < S - 7).astype(np.int32))

    mesh = make_mesh(data=8, model=1)
    qs, ks, vs = (shard_sequence(t, mesh) for t in (q, k, v))
    ms = shard_sequence(mask, mesh, dim=1)

    for causal in (True, False):
        ref = multi_head_attention(q, k, v, attention_mask=mask,
                                   causal=causal, impl="xla")
        got = ring_flash_attention(qs, ks, vs, mesh, axis="data",
                                   attention_mask=ms, causal=causal)
        gm = np.asarray(got) * np.asarray(mask)[:, :, None, None]
        rm = np.asarray(ref) * np.asarray(mask)[:, :, None, None]
        np.testing.assert_allclose(gm, rm, atol=3e-5, err_msg=f"causal={causal}")

    # no mask
    got2 = ring_flash_attention(qs, ks, vs, mesh, axis="data", causal=True)
    ref2 = multi_head_attention(q, k, v, causal=True, impl="xla")
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), atol=3e-5)


def test_sequence_parallel_decoder_matches_single_device(cfg, params):
    """Full decoder with ring attention under seq sharding == single device."""
    from mjvideo_tpu.models import decoder as dec
    from mjvideo_tpu.parallel.sequence import shard_sequence

    lc = cfg.chat.llm
    lm = params["model"]["language_model"]
    rng = np.random.default_rng(17)
    B, S = 1, 64
    x = jnp.asarray(rng.normal(size=(B, S, lc.hidden_size)), jnp.float32)
    mask = jnp.asarray((np.arange(S)[None, :] < S - 9).astype(np.int32))

    ref = dec.decoder_forward(lm, lc, x, attention_mask=mask,
                              attn_impl="xla", remat=False)

    mesh = make_mesh(data=8, model=1)
    xs = shard_sequence(x, mesh)
    ms = shard_sequence(mask, mesh, dim=1)
    for kind in ("ring", "allgather"):
        got = dec.decoder_forward(
            lm, lc, xs, attention_mask=ms, remat=False,
            sp={"mesh": mesh, "axis": "data", "kind": kind},
        )
        gm = np.asarray(got) * np.asarray(mask)[:, :, None]
        rm = np.asarray(ref) * np.asarray(mask)[:, :, None]
        np.testing.assert_allclose(gm, rm, atol=5e-5, err_msg=kind)


def test_tp_sharded_minicpmv_forward_matches_single_device():
    """The judge backbones shard with the same path rules: MiniCPM-V
    (SigLIP tower + Qwen2 text) under tp=2 must match unsharded math —
    the multi-chip path for the 8B published checkpoint."""
    from mjvideo_tpu.configs import LLMConfig
    from mjvideo_tpu.models.minicpmv import (
        MiniCPMVConfig,
        ResamplerConfig,
        init_minicpmv_params,
        lm_logits,
        minicpmv_forward,
    )
    from mjvideo_tpu.models.videoscore import SigLIPVisionConfig

    cfg = MiniCPMVConfig(
        vision=SigLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, patch_size=14, image_size=56),
        resampler=ResamplerConfig(num_queries=6, embed_dim=32, num_heads=4,
                                  kv_dim=32),
        text=LLMConfig(architecture="llama", vocab_size=128, hidden_size=32,
                       intermediate_size=64, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       rope_theta=1e4, rms_norm_eps=1e-6, pad_token_id=0,
                       max_position_embeddings=256, bias=True),
        unk_token_id=120)
    params = init_minicpmv_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    pix = jnp.asarray(rng.normal(size=(2, 28, 42, 3)).astype(np.float32))
    ids = np.full((1, 40), 7, np.int64)
    ids[0, 2:14] = 120  # two 6-query image slots
    ids = jnp.asarray(ids, jnp.int32)
    mask = jnp.ones_like(ids)

    def fwd(p):
        return lm_logits(p, minicpmv_forward(p, cfg, ids, mask,
                                             pixel_values=pix,
                                             attn_impl="xla"))

    single = np.asarray(fwd(params))

    mesh = make_mesh(data=4, model=2)
    p_sh = shard_params(params, mesh, tp=True)
    specs = jax.tree.map(lambda a: a.sharding.spec, p_sh)
    # the SigLIP tower and the Qwen2 text model must both actually shard
    assert "model" in str(specs["vpm"]["layers"]["q"]["kernel"])
    assert "model" in str(
        specs["llm"]["layers"]["attention"]["wq"]["kernel"])
    out = np.asarray(jax.jit(fwd)(p_sh))
    np.testing.assert_allclose(out, single, atol=2e-4)


def test_tp_sharded_cogvlm2_forward_matches_single_device():
    """CogVLM2 under tp=2: EVA tower + both experts' MLPs shard; the
    packed expert qkv stays replicated by design."""
    from mjvideo_tpu.configs import LLMConfig
    from mjvideo_tpu.models.cogvlm2 import (
        CogVLM2Config,
        CogVLM2VisionConfig,
        build_position_ids,
        build_video_prompt_ids,
        cogvlm2_forward,
        init_cogvlm2_params,
        lm_logits,
    )

    cfg = CogVLM2Config(
        vision=CogVLM2VisionConfig(
            hidden_size=16, intermediate_size=32, num_hidden_layers=2,
            num_heads=2, patch_size=7, image_size=28, scaling_factor=8.0),
        text=LLMConfig(architecture="llama", vocab_size=128, hidden_size=32,
                       intermediate_size=48, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       rope_theta=1e4, rms_norm_eps=1e-5, pad_token_id=0,
                       max_position_embeddings=256),
        bos_token_id=1, eos_token_id=2, pad_token_id=0)
    params = init_cogvlm2_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    pix = jnp.asarray(rng.normal(size=(2, 28, 28, 3)).astype(np.float32))
    ids, tt = build_video_prompt_ids(
        lambda s: {"input_ids": [5] * len(s)}, cfg, 2, "ok")
    pos = build_position_ids(tt)
    mask = np.ones_like(ids)

    def fwd(p):
        return lm_logits(p, cogvlm2_forward(
            p, cfg, jnp.asarray(ids), jnp.asarray(tt), jnp.asarray(mask),
            jnp.asarray(pos), pixel_values=pix, attn_impl="xla"))

    single = np.asarray(fwd(params))

    mesh = make_mesh(data=4, model=2)
    p_sh = shard_params(params, mesh, tp=True)
    specs = jax.tree.map(lambda a: a.sharding.spec, p_sh)
    assert "model" in str(specs["vision"]["layers"]["qkv"]["kernel"])
    assert "model" in str(specs["language_model"]["layers"]["mlp"][
        "vision"]["w1"]["kernel"])
    out = np.asarray(jax.jit(fwd)(p_sh))
    np.testing.assert_allclose(out, single, atol=2e-4)


def test_tp_sharded_qknorm_vit_chat_matches_single_device():
    """The InternViT-6B variant (qk_normalization + rms_norm, as in the
    InternVL2-26B judge preset) under data=4 x model=2: the full-hidden-dim
    qk RMSNorm crosses the head split the TP rules put on ``attn/qkv``, so
    GSPMD must insert the resharding — verify the math is unchanged."""
    import dataclasses

    base = tiny_test_config().chat
    cfg = dataclasses.replace(
        base,
        vision=dataclasses.replace(
            base.vision, qk_normalization=True, norm_type="rms_norm"),
    )
    from mjvideo_tpu.models.internvl import chat_forward, init_chat_params

    params = init_chat_params(jax.random.PRNGKey(4), cfg, with_lm_head=False)
    assert "q_norm" in params["vision_model"]["layers"]["attn"]

    rng = np.random.default_rng(5)
    B, frames = 2, 1
    n_img = cfg.num_image_token * frames
    T = n_img + 8
    ids = np.full((B, T), 5, np.int64)
    ids[:, 2:2 + n_img] = cfg.img_context_token_id
    pix = jnp.asarray(rng.normal(size=(
        B * frames, cfg.vision.image_size, cfg.vision.image_size, 3,
    )).astype(np.float32))
    ids = jnp.asarray(ids, jnp.int32)

    single = chat_forward(params, cfg, pix, ids,
                          attn_impl="xla", remat=False)

    mesh = make_mesh(data=4, model=2)
    p_sh = shard_params(params, mesh, tp=True)
    specs = jax.tree.map(lambda a: a.sharding.spec, p_sh)
    assert "model" in str(
        specs["vision_model"]["layers"]["attn"]["qkv"]["kernel"])

    @jax.jit
    def fwd(p, pix, ids):
        return chat_forward(p, cfg, pix, ids, attn_impl="xla", remat=False)

    out = fwd(p_sh, pix, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(single),
                               atol=2e-4)


def test_tp_sharded_phi3_reward_matches_single_device():
    """The 4B architecture (Phi-3 decoder: packed qkv_proj / gate_up_proj)
    under data=4 x model=2 must equal the unsharded forward — the sharding
    path for MJ-VIDEO-4B, whose full-depth training is a 2-chip job
    (23.0G > 15.75G HBM on one v5e, benchmarks/full_depth_train_tpu.py)."""
    import dataclasses

    base = tiny_test_config()
    cfg = dataclasses.replace(
        base,
        chat=dataclasses.replace(
            base.chat,
            llm=dataclasses.replace(base.chat.llm, architecture="phi3"),
            template="phi3-chat",
        ),
    )
    params = init_reward_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(3)
    B = 4
    pix, ids, mask, gpos = _tiny_inputs(cfg, B, rng)

    single = reward_forward(params, cfg, pix, ids, mask, gpos,
                            attn_impl="xla", remat=False)

    mesh = make_mesh(data=4, model=2)
    p_sh = shard_params(params, mesh)
    batch = shard_batch({"pix": pix, "ids": ids, "mask": mask,
                         "gpos": gpos}, mesh)

    @jax.jit
    def fwd(p, b):
        return reward_forward(p, cfg, b["pix"], b["ids"], b["mask"],
                              b["gpos"], attn_impl="xla", remat=False)

    out = fwd(p_sh, batch)
    np.testing.assert_allclose(
        np.asarray(out.score), np.asarray(single.score), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.rewards), np.asarray(single.rewards), atol=1e-4)


def test_tp_sharded_cached_generation_matches_single_device():
    """The cached decode loop (prefill + while-loop steps) under dp x tp.

    Multi-chip judge serving shards the backbone by the Megatron rules;
    the KV cache is created INSIDE the jit, so GSPMD must propagate the
    head sharding from the qkv projections through the cache scatter,
    the attention reads, and the while_loop carry.  Tokens must equal
    the single-device decode — for the dense bf16 cache AND the int8
    (kv_quant) cache, whose scale arrays add a second carried buffer.
    """
    from mjvideo_tpu.models.generate import GenerationConfig, generate
    from mjvideo_tpu.models.internvl import init_chat_params

    cfg = tiny_test_config()
    ch = cfg.chat
    params = init_chat_params(jax.random.PRNGKey(1), ch, with_lm_head=True)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 50, size=(2, 9)).astype(np.int32)
    am = np.ones_like(ids)
    ids[1, :2], am[1, :2] = 0, 0  # left-padded row

    mesh = make_mesh(data=4, model=2)
    p_sh = shard_params(params, mesh, tp=True)
    wq_spec = p_sh["language_model"]["layers"]["attention"]["wq"][
        "kernel"].sharding.spec
    assert "model" in str(wq_spec)

    for kv_quant in (False, True):
        gc = GenerationConfig(max_new_tokens=6, eos_token_id=-1,
                              pad_token_id=0, kv_quant=kv_quant)
        single = generate(params, ch, jnp.asarray(ids), jnp.asarray(am),
                          generation_config=gc)

        @jax.jit
        def gen(p, i, m):
            return generate(p, ch, i, m, generation_config=gc)

        sharded = gen(p_sh, jnp.asarray(ids), jnp.asarray(am))
        assert np.array_equal(np.asarray(single), np.asarray(sharded)), \
            f"kv_quant={kv_quant}"


def test_sp_reward_forward_matches_single_device(cfg, params):
    """END-TO-END sequence parallelism (VERDICT r3 next-2): the full
    reward forward — ViT + scatter + SP decoder + reward head — under a
    sequence-sharded mesh must equal the single-device forward."""
    from mjvideo_tpu.parallel.sequence import shard_sequence

    rng = np.random.default_rng(23)
    c = cfg.chat
    frames = 2
    n_img = c.num_image_token * frames
    # T divisible by the 8-way mesh, with right padding past the prompt
    T = ((n_img + 20 + 7) // 8) * 8
    ids = np.full((1, T), 5, np.int64)
    ids[:, 2:2 + n_img] = c.img_context_token_id
    real = n_img + 12
    mask_np = (np.arange(T)[None, :] < real).astype(np.int32)
    ids[:, real:] = c.llm.pad_token_id
    pix = jnp.asarray(rng.normal(
        size=(frames, c.vision.image_size, c.vision.image_size, 3)
    ).astype(np.float32))
    ids = jnp.asarray(ids, jnp.int32)
    mask = jnp.asarray(mask_np)
    gpos = jnp.asarray([real - 4], jnp.int32)

    single = reward_forward(params, cfg, pix, ids, mask, gpos,
                            attn_impl="xla", remat=False)

    mesh = make_mesh(data=8, model=1)
    ids_s = shard_sequence(ids, mesh, dim=1)
    mask_s = shard_sequence(mask, mesh, dim=1)
    for kind in ("ring", "allgather"):
        @jax.jit
        def fwd(p, pix, ids, mask, gpos, kind=kind):
            return reward_forward(
                p, cfg, pix, ids, mask, gpos, attn_impl="xla", remat=False,
                sp={"mesh": mesh, "axis": "data", "kind": kind},
            )

        out = fwd(shard_params(params, mesh), pix, ids_s, mask_s, gpos)
        np.testing.assert_allclose(np.asarray(out.score),
                                   np.asarray(single.score), atol=1e-4,
                                   err_msg=kind)
        np.testing.assert_allclose(np.asarray(out.rewards),
                                   np.asarray(single.rewards), atol=1e-4,
                                   err_msg=kind)
        np.testing.assert_allclose(np.asarray(out.aspect_scores),
                                   np.asarray(single.aspect_scores),
                                   atol=1e-4, err_msg=kind)


def _stage3_pair_batch(cfg, T, rng):
    c = cfg.chat
    frames = 2
    n_img = c.num_image_token * frames
    assert n_img + 8 <= T
    batch = {}
    for v in (0, 1):
        ids = np.full((1, T), 5, np.int64)
        ids[:, 2:2 + n_img] = c.img_context_token_id
        batch[f"video_{v}_pixel_values"] = rng.normal(
            size=(1, frames, c.vision.image_size, c.vision.image_size, 3)
        ).astype(np.float32)
        batch[f"video_{v}_input_ids"] = ids.astype(np.int32)
        batch[f"video_{v}_attention_mask"] = np.ones((1, T), np.int32)
        batch[f"video_{v}_gating_pos"] = np.full((1,), T - 4, np.int32)
        batch[f"video_{v}_criteria_score"] = rng.choice(
            [-1.0, 0.0, 1.0], size=(1, 28)).astype(np.float32)
        batch[f"video_{v}_criteria_related"] = rng.integers(
            0, 2, size=(1, 28)).astype(np.float32)
        batch[f"video_{v}_aspect_score"] = rng.choice(
            [-1.0, 0.0, 1.0], size=(1, 5)).astype(np.float32)
        batch[f"video_{v}_aspect_related"] = rng.integers(
            0, 2, size=(1, 5)).astype(np.float32)
        batch[f"video_{v}_overall_score"] = rng.choice(
            [-1.0, 1.0], size=(1, 1)).astype(np.float32)
        batch[f"video_{v}_overall_related"] = np.ones((1, 1), np.float32)
    batch["aspect_preference"] = rng.integers(0, 2, (1, 5)).astype(np.int32)
    batch["aspect_mask"] = rng.integers(0, 2, (1, 5)).astype(np.float32)
    batch["overall_preference"] = np.asarray([[1]], np.int32)
    batch["overall_mask"] = np.ones((1, 1), np.float32)
    return {k: jnp.asarray(v) for k, v in batch.items()}


def test_sp_train_gradients_match_single_device(cfg, params):
    """Stage-3 training GRADIENTS under sequence parallelism must equal the
    single-device gradients (VERDICT r4 next-5) — for the ring kind this
    exercises the custom second-ring backward (``_ring_vjp_bwd``)."""
    from jax.sharding import NamedSharding

    from mjvideo_tpu.train.trainer import TrainConfig, make_loss_fn

    rng = np.random.default_rng(37)
    T = ((cfg.chat.num_image_token * 2 + 16 + 7) // 8) * 8
    batch = _stage3_pair_batch(cfg, T, rng)

    tc_plain = TrainConfig(stage=3, attn_impl="xla", remat=False)
    loss_plain = make_loss_fn(cfg, tc_plain)
    ref_loss, ref_grads = jax.value_and_grad(loss_plain)(params, batch)

    mesh = make_mesh(data=8, model=1)
    seq = NamedSharding(mesh, P(None, "data"))
    rep = NamedSharding(mesh, P())
    batch_sp = {
        k: jax.device_put(v, seq if v.ndim == 2 and v.shape[-1] == T else rep)
        for k, v in batch.items()
    }
    p_sh = shard_params(params, mesh)
    for kind in ("ring", "allgather"):
        tc = TrainConfig(stage=3, attn_impl="xla", remat=False, sp=kind)
        loss_sp = make_loss_fn(cfg, tc, mesh=mesh)
        sp_loss, sp_grads = jax.jit(jax.value_and_grad(loss_sp))(
            p_sh, batch_sp)
        np.testing.assert_allclose(float(sp_loss), float(ref_loss),
                                   rtol=2e-5, err_msg=kind)
        flat_ref = jax.tree_util.tree_leaves_with_path(ref_grads)
        flat_sp = jax.tree.leaves(sp_grads)
        assert len(flat_ref) == len(flat_sp)
        for (path, a), b in zip(flat_ref, flat_sp):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=5e-5,
                err_msg=f"{kind}: {jax.tree_util.keystr(path)}")


def test_sp_tile_sharded_vit_matches_plain(cfg, params):
    """Under SP the vision tower shards its TILE batch over the sequence
    axis (VERDICT r4 next-1); the gathered embeds must match the plain
    tower exactly — at a tile count the axis divides (8) AND one it
    doesn't (13, the 12-tile + thumbnail shape), which exercises the
    zero-pad + slice path."""
    from mjvideo_tpu.models.internvl import extract_feature

    c = cfg.chat
    mesh = make_mesh(data=8, model=1)
    rng = np.random.default_rng(31)
    for n_tiles in (8, 13):
        pix = jnp.asarray(rng.normal(
            size=(n_tiles, c.vision.image_size, c.vision.image_size, 3)
        ).astype(np.float32))
        plain = extract_feature(params["model"], c, pix, attn_impl="xla",
                                remat=False)

        @jax.jit
        def sharded(p, pix):
            return extract_feature(
                p, c, pix, attn_impl="xla", remat=False,
                sp={"mesh": mesh, "axis": "data", "kind": "ring"})

        got = sharded(shard_params(params["model"], mesh), pix)
        assert got.shape == plain.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(plain),
                                   atol=2e-5, err_msg=f"n_tiles={n_tiles}")


def test_sp_scorer_matches_plain_scorer(cfg, params):
    """RewardScorer(sp=...) — the user-facing long-context mode — must
    score identically to the plain scorer, for both SP kinds."""
    from mjvideo_tpu.data.prompts import ByteTokenizer
    from mjvideo_tpu.eval.scorer import RewardScorer

    tok = ByteTokenizer()
    kw = dict(attn_impl="xla", dtype=jnp.float32, length_buckets=(256,),
              gating_pattern=tok.gating_pattern())
    plain = RewardScorer(cfg, params, tok, **kw)

    rng = np.random.default_rng(29)
    c = cfg.chat
    n_img = c.num_image_token
    pixels = rng.normal(size=(2, c.vision.image_size, c.vision.image_size, 3)
                        ).astype(np.float32)
    ids_list, gpos = [], []
    for _ in range(2):
        ids = np.full((n_img + 12,), 5, np.int32)
        ids[2:2 + n_img] = c.img_context_token_id
        ids_list.append(ids)
        gpos.append(len(ids) - 4)
    a = plain.score_batch(pixels, ids_list, gpos)

    for kind in ("ring", "allgather"):
        sp = RewardScorer(cfg, params, tok,
                          mesh=make_mesh(data=8, model=1), sp=kind, **kw)
        b = sp.score_batch(pixels, ids_list, gpos)
        np.testing.assert_allclose(np.asarray(a.score), np.asarray(b.score),
                                   atol=1e-4, err_msg=kind)
        np.testing.assert_allclose(np.asarray(a.rewards),
                                   np.asarray(b.rewards), atol=1e-4,
                                   err_msg=kind)

    # guard rails: bad kind / missing mesh / indivisible buckets
    with pytest.raises(ValueError, match="unknown sp kind"):
        RewardScorer(cfg, params, tok, mesh=make_mesh(), sp="nope", **kw)
    with pytest.raises(ValueError, match="requires a mesh"):
        RewardScorer(cfg, params, tok, sp="ring", **kw)
    with pytest.raises(ValueError, match="not divisible"):
        RewardScorer(cfg, params, tok, mesh=make_mesh(data=8, model=1),
                     sp="ring", attn_impl="xla", dtype=jnp.float32,
                     length_buckets=(250,),
                     gating_pattern=tok.gating_pattern())
