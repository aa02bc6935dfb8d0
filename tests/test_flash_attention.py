"""Pallas flash attention vs the XLA einsum oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjvideo_tpu.ops.attention import multi_head_attention
from mjvideo_tpu.ops.flash_attention import flash_attention


def _rand(rng, shape):
    return jnp.asarray(rng.normal(size=shape), jnp.float32)


@pytest.mark.parametrize(
    "B,S,Hq,Hkv,D,causal,masked",
    [
        (2, 67, 4, 2, 64, True, True),    # GQA causal + padding (LLM shape)
        (1, 130, 4, 4, 32, False, True),  # MHA non-causal (ViT shape)
        (2, 35, 8, 2, 16, True, False),   # GQA causal, no padding
    ],
)
def test_flash_matches_xla(B, S, Hq, Hkv, D, causal, masked):
    rng = np.random.default_rng(0)
    q = _rand(rng, (B, S, Hq, D))
    k = _rand(rng, (B, S, Hkv, D))
    v = _rand(rng, (B, S, Hkv, D))
    mask = None
    if masked:
        lens = rng.integers(5, S, size=B)
        mask = jnp.asarray(
            (np.arange(S)[None, :] < lens[:, None]).astype(np.int32)
        )
    ref = multi_head_attention(q, k, v, attention_mask=mask, causal=causal,
                               impl="xla")
    got = flash_attention(q, k, v, attention_mask=mask, causal=causal)
    if mask is not None:
        ref = ref * mask[:, :, None, None]
        got = got * mask[:, :, None, None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_flash_gradients_match_xla():
    rng = np.random.default_rng(1)
    q = _rand(rng, (1, 33, 4, 16))
    k = _rand(rng, (1, 33, 2, 16))
    v = _rand(rng, (1, 33, 2, 16))

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) ** 2)

    g_flash = jax.grad(
        loss(lambda q, k, v: flash_attention(q, k, v, causal=True)),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_xla = jax.grad(
        loss(lambda q, k, v: multi_head_attention(q, k, v, causal=True)),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_flash_fully_masked_rows_are_zero():
    rng = np.random.default_rng(2)
    q = _rand(rng, (1, 16, 2, 8))
    k = _rand(rng, (1, 16, 2, 8))
    v = _rand(rng, (1, 16, 2, 8))
    mask = jnp.zeros((1, 16), jnp.int32)
    out = flash_attention(q, k, v, attention_mask=mask, causal=False)
    assert bool(jnp.all(jnp.isfinite(out)))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


@pytest.mark.parametrize("causal,masked,Hkv", [(True, True, 2),
                                               (False, False, 4)])
def test_pallas_backward_kernels_match_xla_vjp(causal, masked, Hkv):
    """The TPU backward path (dK/dV + dQ kernels), run in interpret mode,
    must produce the same gradients as the XLA einsum VJP."""
    from mjvideo_tpu.ops.flash_attention import (
        _bwd_impl,
        flash_attention_with_lse,
    )

    rng = np.random.default_rng(3)
    B, S, Hq, D = 2, 70, 4, 32
    q = jnp.asarray(rng.normal(size=(B, S, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, S, Hq, D)), jnp.float32)
    mask = None
    if masked:
        lens = rng.integers(10, S, size=B)
        mask = jnp.asarray(
            (np.arange(S)[None, :] < lens[:, None]).astype(np.int32)
        )

    # A masked loss zeroes the cotangent on padded rows; use the same
    # cotangent for both paths.
    gm = g if mask is None else g * mask[:, :, None, None]

    out, lse = flash_attention_with_lse(
        q, k, v, attention_mask=mask, causal=causal, interpret=True
    )
    dq, dk, dv = _bwd_impl(q, k, v, mask, None, out, lse, gm,
                           causal, None, None, None, True)

    _, vjp = jax.vjp(
        lambda q_, k_, v_: multi_head_attention(
            q_, k_, v_, attention_mask=mask, causal=causal, impl="xla"
        ),
        q, k, v,
    )
    dq_ref, dk_ref, dv_ref = vjp(gm)

    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), atol=3e-5)


def test_flash_cross_attention_q_ne_k():
    """Non-causal cross-attention shapes (Q != K) must match XLA."""
    rng = np.random.default_rng(4)
    B, Q, K, H, D = 2, 37, 91, 4, 16
    q = _rand(rng, (B, Q, H, D))
    k = _rand(rng, (B, K, H, D))
    v = _rand(rng, (B, K, H, D))
    lens = rng.integers(10, K, size=B)
    mask = jnp.asarray((np.arange(K)[None, :] < lens[:, None]).astype(np.int32))
    ref = multi_head_attention(q, k, v, attention_mask=mask, causal=False,
                               impl="xla")
    got = flash_attention(q, k, v, attention_mask=mask, causal=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_flash_custom_scale():
    rng = np.random.default_rng(5)
    q = _rand(rng, (1, 24, 2, 8))
    k = _rand(rng, (1, 24, 2, 8))
    v = _rand(rng, (1, 24, 2, 8))
    ref = multi_head_attention(q, k, v, causal=True, scale=0.25, impl="xla")
    got = flash_attention(q, k, v, causal=True, scale=0.25)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("S,H,hp", [(67, 4, None), (129, 4, 2), (40, 8, 4)])
def test_nc_maskless_kernel_matches_xla(S, H, hp):
    """The specialized maskless non-causal path (direct softmax + analytic
    kv-pad correction + multi-head programs) must match XLA exactly,
    including K not a multiple of 8."""
    from mjvideo_tpu.ops.flash_attention import flash_attention_with_lse

    rng = np.random.default_rng(0)
    D = 64
    q = _rand(rng, (2, S, H, D))
    k = _rand(rng, (2, S, H, D))
    v = _rand(rng, (2, S, H, D))
    ref = multi_head_attention(q, k, v, causal=False, impl="xla")
    got, lse = flash_attention_with_lse(
        q, k, v, causal=False, interpret=True, heads_per_program=hp
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    # lse must equal log(sum(exp(s))) of the true (unpadded) row
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   precision=jax.lax.Precision.HIGHEST) * (D ** -0.5)
    lse_ref = jax.scipy.special.logsumexp(s, axis=-1)  # (B, H, S)
    np.testing.assert_allclose(
        np.asarray(lse[:, :, 0, :S]), np.asarray(lse_ref), atol=2e-5
    )


def test_nc_norm_bound_matches_xla_and_degrades_gracefully():
    """``norm_bound=True`` (Cauchy-Schwarz softmax bound instead of the
    per-row max — docs/PERF.md round 4) must (a) match XLA at normalized
    activation scales, (b) keep kv_valid semantics, (c) keep the TRUE
    logsumexp so the backward is bound-agnostic, and (d) stay finite —
    never NaN — at absurd scales where the exp mass underflows."""
    from mjvideo_tpu.ops.flash_attention import (
        _fwd_impl,
        flash_attention,
    )

    rng = np.random.default_rng(7)
    B, S, H, D = 2, 67, 4, 64
    q = _rand(rng, (B, S, H, D))
    k = _rand(rng, (B, S, H, D))
    v = _rand(rng, (B, S, H, D))
    ref = multi_head_attention(q, k, v, causal=False, impl="xla")
    got = flash_attention(q, k, v, causal=False, norm_bound=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    # (b) kv_valid pad correction composes with the bound
    Sp = 72
    row_ok = (jnp.arange(Sp) < S).astype(q.dtype)[None, :, None, None]
    qp = _rand(rng, (B, Sp, H, D))
    got_pad = flash_attention(qp, jnp.pad(k, ((0, 0), (0, Sp - S), (0, 0),
                                              (0, 0))) * row_ok,
                              jnp.pad(v, ((0, 0), (0, Sp - S), (0, 0),
                                          (0, 0))) * row_ok,
                              causal=False, kv_valid=S, norm_bound=True)
    ref_pad = multi_head_attention(qp, k, v, causal=False, impl="xla")
    np.testing.assert_allclose(np.asarray(got_pad), np.asarray(ref_pad),
                               atol=2e-5)

    # (c) lse is the true logsumexp (shift-invariance), so gradients run
    # through the unchanged backward kernels
    _, lse = _fwd_impl(q, k, v, None, None, False, None, None, None,
                       True, True, norm_bound=True)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   precision=jax.lax.Precision.HIGHEST) * (D ** -0.5)
    lse_ref = jax.scipy.special.logsumexp(s, axis=-1)
    np.testing.assert_allclose(np.asarray(lse[:, :, 0, :S]),
                               np.asarray(lse_ref), atol=2e-4)

    # (d) graceful degradation: 30x-scale inputs push the bound gap past
    # the fp32 underflow threshold — rows may go to ~0 but never NaN/Inf
    wild = flash_attention(q * 30, k * 30, v, causal=False, norm_bound=True)
    assert bool(jnp.isfinite(wild).all())


def test_causal_norm_bound_matches_xla_and_degrades_gracefully():
    """``norm_bound=True`` on the causal/masked path (``_fwd_bound_kernel``
    — the online softmax collapsed to a constant per-row Cauchy-Schwarz
    bound, docs/PERF.md round 4) must (a) match XLA with GQA + ragged
    padding, (b) run per-row q_offset suffix continuations identically to
    the exact kernel, (c) keep the TRUE logsumexp so the unchanged backward
    kernels produce exact gradients, and (d) never emit NaN/Inf even when
    the exp mass underflows."""
    from mjvideo_tpu.ops.flash_attention import _fwd_impl

    rng = np.random.default_rng(11)
    B, S, Hq, Hkv, D = 2, 67, 8, 2, 32
    q = _rand(rng, (B, S, Hq, D))
    k = _rand(rng, (B, S, Hkv, D))
    v = _rand(rng, (B, S, Hkv, D))
    lens = np.array([S, S - 23])
    mask = jnp.asarray((np.arange(S)[None] < lens[:, None]).astype(np.int32))

    # (a) forward parity, GQA causal + ragged padding
    ref = multi_head_attention(q, k, v, attention_mask=mask, causal=True,
                               impl="xla")
    got = flash_attention(q, k, v, attention_mask=mask, causal=True,
                          norm_bound=True)
    m3 = mask[:, :, None, None]
    np.testing.assert_allclose(np.asarray(got * m3), np.asarray(ref * m3),
                               atol=2e-5)

    # (b) per-row q_offset (prefix-cache suffix continuation)
    off = jnp.asarray([3, 10], jnp.int32)
    qs = _rand(rng, (B, 8, Hq, D))
    got_off = flash_attention(qs, k, v, attention_mask=mask, causal=True,
                              q_offset=off, norm_bound=True)
    ref_off = flash_attention(qs, k, v, attention_mask=mask, causal=True,
                              q_offset=off, norm_bound=False)
    np.testing.assert_allclose(np.asarray(got_off), np.asarray(ref_off),
                               atol=2e-5)

    # (c) lse is the true logsumexp -> exact gradients through the
    # bound-agnostic backward kernels
    _, lse = _fwd_impl(q, k, v, mask, None, True, None, None, None,
                       True, True, norm_bound=True)
    G = Hq // Hkv
    s = jnp.einsum("bqhd,bkhd->bhqk", q, jnp.repeat(k, G, axis=2),
                   precision=jax.lax.Precision.HIGHEST) * (D ** -0.5)
    tri = np.tril(np.ones((S, S), bool))
    vis = tri[None, None] & (np.asarray(mask, bool))[:, None, None, :]
    lse_ref = jax.scipy.special.logsumexp(
        jnp.where(vis, s, -jnp.inf), axis=-1)
    d = jnp.abs(lse[:, :, 0, :S] - lse_ref)
    np.testing.assert_allclose(
        np.asarray(jnp.where(jnp.isfinite(lse_ref), d, 0.0)), 0, atol=2e-4)

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) ** 2)

    g_b = jax.grad(loss(lambda q, k, v: flash_attention(
        q, k, v, attention_mask=mask, causal=True, norm_bound=True)),
        argnums=(0, 1, 2))(q, k, v)
    g_x = jax.grad(loss(lambda q, k, v: multi_head_attention(
        q, k, v, attention_mask=mask, causal=True, impl="xla")),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_b, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)

    # (d) graceful degradation at absurd scales: finite, never NaN
    wild = flash_attention(q * 30, k * 30, v, attention_mask=mask,
                           causal=True, norm_bound=True)
    assert bool(jnp.isfinite(wild).all())


def test_row_causal_norm_bound_matches_and_is_prefix_deterministic():
    """``norm_bound='rows'`` (the cached-decode variant, VERDICT r4
    next-4): (a) matches XLA under GQA + ragged padding + per-row
    q_offset, and (b) a prefix-only prefill and a full-prompt prefill
    produce BIT-identical prefix rows — the determinism-by-construction
    property that lets the cached judge paths keep the bound without
    reopening the greedy-tie caveat (``generate._CACHE_BOUND``)."""
    rng = np.random.default_rng(13)
    B, Sq, Sk, Hq, Hkv, D = 2, 40, 96, 8, 2, 32
    q = _rand(rng, (B, Sq, Hq, D))
    k = _rand(rng, (B, Sk, Hkv, D))
    v = _rand(rng, (B, Sk, Hkv, D))
    lens = np.array([Sk, Sk - 23])
    mask = jnp.asarray((np.arange(Sk)[None] < lens[:, None]).astype(np.int32))
    off = jnp.asarray([7, 30], jnp.int32)

    got = flash_attention(q, k, v, attention_mask=mask, causal=True,
                          q_offset=off, norm_bound="rows")
    ref = flash_attention(q, k, v, attention_mask=mask, causal=True,
                          q_offset=off, norm_bound=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    # (b) prefix determinism: shared rows bit-identical between a
    # prefix-only call and a full-sequence call.
    S, P = 96, 64
    qf = _rand(rng, (1, S, Hq, D))
    kf = _rand(rng, (1, S, Hkv, D))
    vf = _rand(rng, (1, S, Hkv, D))
    full = flash_attention(qf, kf, vf, causal=True, norm_bound="rows")
    prefix = flash_attention(qf[:, :P], kf[:, :P], vf[:, :P], causal=True,
                             norm_bound="rows")
    assert np.array_equal(np.asarray(full[:, :P]), np.asarray(prefix)), \
        "prefix rows must be bit-identical under the rows bound"

    # non-causal use is a contract violation, not a silent wrong answer
    with pytest.raises(AssertionError):
        flash_attention(q, k, v, attention_mask=mask, causal=False,
                        q_offset=off, norm_bound="rows")


def test_kv_valid_matches_unpadded_reference():
    """``kv_valid`` (caller pre-pads to an aligned length, zeroes the dead
    k/v tail) must reproduce the unpadded forward AND gradients on the real
    rows — the contract ``models/vit.py`` relies on to run the ViT stack at
    a fixed 8-aligned sequence length with no per-layer pad/slice copies."""
    rng = np.random.default_rng(3)
    B, S, Sp, H, D = 2, 67, 72, 4, 32
    q = _rand(rng, (B, Sp, H, D))
    k = _rand(rng, (B, Sp, H, D))
    v = _rand(rng, (B, Sp, H, D))
    row_ok = (jnp.arange(Sp) < S).astype(q.dtype)[None, :, None, None]

    def padded(q, k, v):
        return flash_attention(q, k * row_ok, v * row_ok, causal=False,
                               kv_valid=S)

    ref = multi_head_attention(q[:, :S], k[:, :S], v[:, :S], causal=False,
                               impl="xla")
    got = padded(q, k, v)
    np.testing.assert_allclose(np.asarray(got[:, :S]), np.asarray(ref),
                               atol=2e-5)

    # Gradients: cotangent only on the real rows (as vit_forward's final
    # slice guarantees); real-row grads must match the unpadded VJP and
    # dead-row grads must be exactly zero after the row_ok mask's VJP.
    g = _rand(rng, (B, S, H, D))
    gp = jnp.pad(g, ((0, 0), (0, Sp - S), (0, 0), (0, 0)))
    _, vjp = jax.vjp(padded, q, k, v)
    dq, dk, dv = vjp(gp)
    _, vjp_ref = jax.vjp(
        lambda q_, k_, v_: multi_head_attention(q_, k_, v_, causal=False,
                                                impl="xla"),
        q[:, :S], k[:, :S], v[:, :S],
    )
    dq_ref, dk_ref, dv_ref = vjp_ref(g)
    for a, b in ((dq, dq_ref), (dk, dk_ref), (dv, dv_ref)):
        np.testing.assert_allclose(np.asarray(a[:, :S]), np.asarray(b),
                                   atol=3e-5)
        np.testing.assert_allclose(np.asarray(a[:, S:]), 0.0, atol=3e-5)


def test_nc_maskless_backward_consumes_new_lse():
    """On-TPU backward pairs the specialized forward's lse with the general
    dK/dV + dQ kernels (ones mask); must match the XLA VJP."""
    from mjvideo_tpu.ops.flash_attention import (
        _bwd_impl,
        flash_attention_with_lse,
    )

    rng = np.random.default_rng(1)
    B, S, H, D = 2, 67, 4, 32
    q = _rand(rng, (B, S, H, D))
    k = _rand(rng, (B, S, H, D))
    v = _rand(rng, (B, S, H, D))
    g = _rand(rng, (B, S, H, D))

    out, lse = flash_attention_with_lse(q, k, v, causal=False, interpret=True)
    dq, dk, dv = _bwd_impl(q, k, v, None, None, out, lse, g,
                           False, None, None, None, True)
    _, vjp = jax.vjp(
        lambda q_, k_, v_: multi_head_attention(q_, k_, v_, causal=False,
                                                impl="xla"),
        q, k, v,
    )
    dq_ref, dk_ref, dv_ref = vjp(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), atol=3e-5)


def test_per_row_q_offset_matches_reference():
    """Per-row q_offset (prefix-cache suffix continuation): each batch
    row's queries start at a different global position; the kernel must
    apply each row's own causal frontier."""
    import jax.numpy as jnp

    from mjvideo_tpu.ops.attention import attention_xla
    from mjvideo_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(11)
    B, Q, K, H, D = 3, 4, 24, 2, 8
    q = jnp.asarray(rng.normal(size=(B, Q, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, K, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, K, H, D)), jnp.float32)
    offs = np.asarray([5, 9, 13], np.int32)
    # rows beyond each row's offset+Q are invalid cache slots
    mask = (np.arange(K)[None, :] < (offs + Q)[:, None]).astype(np.int32)

    got = np.asarray(flash_attention(
        q, k, v, attention_mask=jnp.asarray(mask), causal=True,
        q_offset=jnp.asarray(offs)))

    # reference: per-row explicit bias
    qpos = offs[:, None, None] + np.arange(Q)[None, :, None]
    kpos = np.arange(K)[None, None, :]
    valid = (qpos >= kpos) & (mask[:, None, :] != 0)
    bias = jnp.asarray(np.where(valid, 0.0, -1e30),
                       jnp.float32)[:, None]
    want = np.asarray(attention_xla(q, k, v, bias=bias))
    np.testing.assert_allclose(got, want, atol=2e-6)

    # scalar offset still broadcasts (sequence-parallel contract)
    got_s = np.asarray(flash_attention(
        q, k, v, attention_mask=jnp.ones((B, K), jnp.int32), causal=True,
        q_offset=jnp.asarray(7, jnp.int32)))
    qpos = 7 + np.arange(Q)[None, :, None]
    valid = np.broadcast_to(qpos >= kpos, (B, Q, K))
    bias = jnp.asarray(np.where(valid, 0.0, -1e30), jnp.float32)[:, None]
    want_s = np.asarray(attention_xla(q, k, v, bias=bias))
    np.testing.assert_allclose(got_s, want_s, atol=2e-6)
