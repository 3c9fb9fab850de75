"""Pallas kernel parity tests (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libra_tpu.ops.attention import AttentionInputs, bridged_attention, causal_bias
from libra_tpu.ops.pallas.flash_bridge import flash_bridged_attention


@pytest.mark.parametrize("use_bridge", [True, False])
@pytest.mark.parametrize("nq,nk", [(16, 16), (8, 24)])
def test_flash_bridge_matches_xla(use_bridge, nq, nk):
    B, H, d = 2, 2, 8
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 7)
    q = jax.random.normal(ks[0], (B, nq, H, d))
    k = jax.random.normal(ks[1], (B, nk, H, d))
    v = jax.random.normal(ks[2], (B, nk, H, d))
    kb = jax.random.normal(ks[3], (B, nk, H, d)) if use_bridge else None
    vb = jax.random.normal(ks[4], (B, nk, H, d)) if use_bridge else None
    flag_q = jax.random.bernoulli(ks[5], 0.5, (B, nq))
    flag_kv = jnp.concatenate(
        [jax.random.bernoulli(ks[6], 0.5, (B, nk - nq)), flag_q], axis=1) \
        if nk > nq else flag_q

    mask = jnp.ones((B, nk), jnp.int32).at[0, :2].set(0)
    bias = causal_bias(mask, nq, nk)

    want = bridged_attention(AttentionInputs(q, k, v, kb, vb),
                             flag_q, flag_kv, bias)
    got = flash_bridged_attention(q, k, v, kb, vb, flag_q, flag_kv, bias,
                                  block_q=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_bridge_block_split():
    """Multiple q-blocks must agree with a single block."""
    B, H, d, N = 1, 2, 8, 32
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    q, k, v, kb, vb = (jax.random.normal(ks[i], (B, N, H, d))
                       for i in range(5))
    flag = jax.random.bernoulli(ks[5], 0.3, (B, N))
    bias = causal_bias(jnp.ones((B, N), jnp.int32), N, N)
    one = flash_bridged_attention(q, k, v, kb, vb, flag, flag, bias,
                                  block_q=32, interpret=True)
    many = flash_bridged_attention(q, k, v, kb, vb, flag, flag, bias,
                                   block_q=8, interpret=True)
    np.testing.assert_allclose(np.asarray(one), np.asarray(many),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("use_bridge", [True, False])
@pytest.mark.parametrize("nq,nk", [(16, 16), (8, 24)])
def test_flash_bridge_grads_match_xla(use_bridge, nq, nk):
    """Fused Pallas backward (custom VJP, interpret) vs XLA autodiff of
    bridged_attention: dq/dk/dv[/dkb/dvb] must agree. bias grad is zero
    by contract (mask-derived; flash_bridge.py module docstring)."""
    B, H, d = 2, 2, 8
    ks = jax.random.split(jax.random.PRNGKey(3), 8)
    q = jax.random.normal(ks[0], (B, nq, H, d))
    k = jax.random.normal(ks[1], (B, nk, H, d))
    v = jax.random.normal(ks[2], (B, nk, H, d))
    kb = jax.random.normal(ks[3], (B, nk, H, d)) if use_bridge else None
    vb = jax.random.normal(ks[4], (B, nk, H, d)) if use_bridge else None
    flag_q = jax.random.bernoulli(ks[5], 0.5, (B, nq))
    flag_kv = jnp.concatenate(
        [jax.random.bernoulli(ks[6], 0.5, (B, nk - nq)), flag_q], axis=1) \
        if nk > nq else flag_q
    # mask interior keys (2, 3), not the causal origin: a FULLY-masked
    # query row has an intentionally different (zero, not tie-split)
    # gradient -- covered by test_flash_bridge_fully_masked_row_grads
    mask = jnp.ones((B, nk), jnp.int32).at[0, 2:4].set(0)
    bias = causal_bias(mask, nq, nk)
    cot = jax.random.normal(ks[7], (B, nq, H, d))

    diff_args = (q, k, v, kb, vb) if use_bridge else (q, k, v)

    def loss_flash(*ops):
        qq, kk, vv = ops[:3]
        kbb, vbb = (ops[3], ops[4]) if use_bridge else (None, None)
        out = flash_bridged_attention(qq, kk, vv, kbb, vbb, flag_q,
                                      flag_kv, bias, block_q=8,
                                      interpret=True)
        return jnp.sum(out * cot)

    def loss_xla(*ops):
        qq, kk, vv = ops[:3]
        kbb, vbb = (ops[3], ops[4]) if use_bridge else (None, None)
        out = bridged_attention(AttentionInputs(qq, kk, vv, kbb, vbb),
                                flag_q, flag_kv, bias)
        return jnp.sum(out * cot)

    got = jax.grad(loss_flash, argnums=tuple(range(len(diff_args))))(
        *diff_args)
    want = jax.grad(loss_xla, argnums=tuple(range(len(diff_args))))(
        *diff_args)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4)


def test_flash_bridge_grads_ragged_padded():
    """Ragged Nq > 256 with no 16-divisor (the N=698-family train proxy
    shape) takes the zero-padded backward (block 128); grads must still
    match XLA autodiff exactly on the real rows."""
    B, H, d, N = 1, 1, 8, 260
    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    q = jax.random.normal(ks[0], (B, N, H, d))
    k = jax.random.normal(ks[1], (B, N, H, d))
    v = jax.random.normal(ks[2], (B, N, H, d))
    flag = jax.random.bernoulli(ks[3], 0.5, (B, N))
    bias = causal_bias(jnp.ones((B, N), jnp.int32), N, N)

    def loss(fn, qq, kk, vv):
        return jnp.sum(fn(qq, kk, vv) ** 2)

    def flash(qq, kk, vv):
        return flash_bridged_attention(qq, kk, vv, kk, vv, flag, flag,
                                       bias, block_q=N, interpret=True)

    def xla(qq, kk, vv):
        return bridged_attention(AttentionInputs(qq, kk, vv, kk, vv),
                                 flag, flag, bias)

    got = jax.grad(functools.partial(loss, flash), argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(functools.partial(loss, xla), argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=3e-4, atol=3e-4)


def test_flash_bridge_fully_masked_row_grads():
    """A fully-masked query row (pad token at the causal origin) gets a
    ZERO score gradient from the fused backward -- NOT XLA autodiff's
    halved tie-split garbage (flash_bridge.py _bwd_kernel comment). Rows
    with any visible key must still match XLA exactly."""
    B, H, d, N = 1, 2, 8, 16
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    q = jax.random.normal(ks[0], (B, N, H, d))
    k = jax.random.normal(ks[1], (B, N, H, d))
    v = jax.random.normal(ks[2], (B, N, H, d))
    flag = jnp.zeros((B, N), jnp.bool_)
    # keys 0..1 masked => causal rows 0..1 see NOTHING
    mask = jnp.ones((B, N), jnp.int32).at[0, :2].set(0)
    bias = causal_bias(mask, N, N)

    def loss(fn, qq, kk, vv):
        return jnp.sum(fn(qq, kk, vv) ** 2)

    def flash(qq, kk, vv):
        return flash_bridged_attention(qq, kk, vv, None, None, flag, flag,
                                       bias, block_q=8, interpret=True)

    def xla(qq, kk, vv):
        return bridged_attention(AttentionInputs(qq, kk, vv, None, None),
                                 flag, flag, bias)

    got = jax.grad(functools.partial(loss, flash), argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(functools.partial(loss, xla), argnums=(0, 1, 2))(q, k, v)
    # dq on the dead rows: exactly zero from the kernel
    np.testing.assert_array_equal(np.asarray(got[0][:, :2]), 0.0)
    # live rows: parity with XLA on every grad
    np.testing.assert_allclose(np.asarray(got[0][:, 2:]),
                               np.asarray(want[0][:, 2:]),
                               rtol=2e-4, atol=2e-4)
    # dv: the dead rows' uniform-average contribution matches XLA (the
    # forward really does emit mean(V) there in both paths)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(want[2]),
                               rtol=2e-4, atol=2e-4)


def test_flash_bridge_grad_under_jit_and_bool_flags():
    """The VJP must survive jit and boolean flags (float0 cotangents),
    and multi-q-block backward must equal single-block."""
    B, H, d, N = 1, 2, 8, 32
    ks = jax.random.split(jax.random.PRNGKey(9), 6)
    q, k, v, kb, vb = (jax.random.normal(ks[i], (B, N, H, d))
                       for i in range(5))
    flag = jax.random.bernoulli(ks[5], 0.3, (B, N))
    bias = causal_bias(jnp.ones((B, N), jnp.int32), N, N)

    def loss(bq, qq, kk):
        out = flash_bridged_attention(qq, kk, v, kb, vb, flag, flag, bias,
                                      block_q=bq, interpret=True)
        return jnp.sum(out ** 2)

    g_one = jax.jit(jax.grad(functools.partial(loss, 32),
                             argnums=(0, 1)))(q, k)
    g_many = jax.jit(jax.grad(functools.partial(loss, 8),
                              argnums=(0, 1)))(q, k)
    for a, b in zip(g_one, g_many):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_int4_matmul_interpret():
    """int4 pack/dequant bounds and kernel parity (interpret mode):
    signed-byte layout, +8-bias correction, plain + stacked forms."""
    import jax
    import jax.numpy as jnp
    from libra_tpu.ops.pallas.int4_matmul import (dequant_int4, int4_matmul,
                                                  pack_int4, supports)

    rng = np.random.RandomState(0)
    w = rng.randn(256, 384).astype(np.float32)
    p, s = pack_int4(w, group=64)
    assert p.dtype == jnp.int8 and p.shape == (128, 384)
    assert s.shape == (4, 384)
    wd = np.asarray(dequant_int4(p, s, group=64))
    err = np.abs(wd - w).reshape(4, 64, 384)
    amax = np.abs(w.reshape(4, 64, 384)).max(1, keepdims=True)
    assert (err <= amax / 14 + 1e-6).all()

    x = jnp.asarray(rng.randn(3, 256), jnp.bfloat16)
    want = np.asarray(x, np.float32) @ wd
    got = int4_matmul(x, jnp.asarray(p), jnp.asarray(s), group=64,
                      interpret=True)
    assert supports(x, p, s, 64)
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=2e-2, atol=2e-2)    # bf16 dots/output

    # stacked (L, K/2, O) + scalar-prefetched layer index
    w2 = rng.randn(256, 384).astype(np.float32)
    p2, s2 = pack_int4(w2, group=64)
    pst = jnp.stack([jnp.asarray(p), jnp.asarray(p2)])
    sst = jnp.stack([jnp.asarray(s), jnp.asarray(s2)])
    for li, wref in ((0, wd), (1, np.asarray(dequant_int4(p2, s2,
                                                          group=64)))):
        got = int4_matmul(x, pst, sst, group=64, idx=jnp.int32(li),
                          interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(x, np.float32) @ wref,
                                   rtol=2e-2, atol=2e-2)

    # W4A8 mode: adds per-row int8 activation quantization (~0.7% budget)
    got8 = int4_matmul(x, jnp.asarray(p), jnp.asarray(s), group=64,
                       a8=True, interpret=True)
    ref = np.asarray(x, np.float32) @ wd
    denom = max(np.abs(ref).max(), 1e-6)
    assert np.abs(np.asarray(got8, np.float32) - ref).max() / denom < 0.03


def test_int8_matmul_interpret():
    """Fused int8-dequant matmul (interpret mode) vs the exact f32
    reference x @ (q * scale), per-out-channel scales."""
    from libra_tpu.ops.pallas.int8_matmul import int8_matmul
    from libra_tpu.quantization import quantize_array

    rng = np.random.RandomState(0)
    for (K, F), (M, lead) in [((256, 384), (1, (1,))),
                              ((256, 384), (4, (4,))),
                              ((256, 384), (6, (2, 3)))]:
        w = rng.randn(K, F).astype(np.float32) * 0.1
        qa = quantize_array(w, axis=-2)
        x = rng.randn(*lead, K).astype(np.float32) * 0.5
        # the kernel rounds x to bf16 (int8 weights are EXACT in bf16, so
        # that is the only rounding before the f32-accumulated dot)
        x_bf16 = np.asarray(jnp.asarray(x).astype(jnp.bfloat16)
                            .astype(jnp.float32))
        want = x_bf16.reshape(-1, K) @ (qa.q.astype(np.float32) * qa.scale)
        got = int8_matmul(jnp.asarray(x), jnp.asarray(qa.q),
                          jnp.asarray(qa.scale), interpret=True)
        assert got.shape == lead + (F,)
        np.testing.assert_allclose(np.asarray(got).reshape(-1, F), want,
                                   rtol=1e-4, atol=1e-5)


def test_qdot_dispatch_and_fallback():
    """qdot: plain weights and unaligned/large-M shapes use the XLA path;
    QuantizedArray dequant matches astype semantics."""
    from libra_tpu.ops.qlinear import qdot
    from libra_tpu.quantization import quantize_array

    rng = np.random.RandomState(1)
    w = rng.randn(96, 80).astype(np.float32)     # unaligned: fallback
    qa = quantize_array(w, axis=-2)
    x = rng.randn(2, 5, 96).astype(np.float32)
    want = np.einsum("bni,io->bno", x, qa.q.astype(np.float32) * qa.scale)
    got = np.asarray(qdot(jnp.asarray(x), qa))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    got_plain = np.asarray(qdot(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(got_plain, np.einsum("bni,io->bno", x, w),
                               rtol=1e-4, atol=1e-5)


def test_int8_matmul_stacked_layer_select(  ):
    """Stacked (L, K, F) form: scalar-prefetched layer index must read
    exactly layer idx's weights (vs slicing first)."""
    from libra_tpu.ops.pallas.int8_matmul import int8_matmul
    from libra_tpu.quantization import quantize_array

    rng = np.random.RandomState(2)
    L, K, F = 3, 256, 384
    w = rng.randn(L, K, F).astype(np.float32) * 0.1
    qa = quantize_array(w, axis=-2)
    assert qa.scale.shape == (L, 1, F)
    x = rng.randn(4, K).astype(np.float32)
    for l in range(L):
        want = int8_matmul(jnp.asarray(x), jnp.asarray(qa.q[l]),
                           jnp.asarray(qa.scale[l]), interpret=True)
        got = int8_matmul(jnp.asarray(x), jnp.asarray(qa.q),
                          jnp.asarray(qa.scale), idx=jnp.int32(l),
                          interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_layer_view_astype_matches_slice():
    from libra_tpu.quantization import LayerView, quantize_array

    rng = np.random.RandomState(3)
    w = rng.randn(2, 32, 48).astype(np.float32)
    qa = quantize_array(w, axis=-2)
    v = LayerView(jax.tree_util.tree_map(jnp.asarray, qa), jnp.int32(1))
    assert v.shape == (32, 48) and v.ndim == 2
    np.testing.assert_array_equal(
        np.asarray(v.astype(jnp.float32)),
        qa.q[1].astype(np.float32) * qa.scale[1])


@pytest.mark.parametrize("use_bridge", [True, False])
def test_int8_decode_attention_matches_xla(use_bridge):
    """Fused int8 decode attention (interpret) vs bridged_attention over
    the dequantized cache -- the XLA decode path it replaces."""
    from libra_tpu.ops.pallas.decode_attention import int8_decode_attention

    B, S, H, d = 2, 128, 8, 128
    rng = np.random.RandomState(0)

    def qbuf(seed):
        # HEAD-MAJOR (B, H, S, d) int8 with (B, H, S) scales -- the
        # quantized-cache layout (models.libra.init_cache)
        x = np.random.RandomState(seed).randn(B, H, S, d).astype(np.float32)
        a = np.abs(x).max(-1, keepdims=True)
        scale = np.where(a > 0, a, 1.0) / 127.0
        qv = np.clip(np.round(x / scale), -127, 127).astype(np.int8)
        return jnp.asarray(qv), jnp.asarray(scale[..., 0])      # (B, H, S)

    kq, ks = qbuf(1)
    vq, vs = qbuf(2)
    kbq, kbs = qbuf(3) if use_bridge else (None, None)
    vbq, vbs = qbuf(4) if use_bridge else (None, None)
    q = jnp.asarray(rng.randn(B, 1, H, d).astype(np.float32))
    flag_q = jnp.asarray([True, False])
    kv_flag = jnp.asarray(rng.rand(B, S) < 0.4)
    # mask out a tail (unwritten cache positions) + some pad slots
    keep = np.ones((B, S), bool)
    keep[:, 100:] = False
    keep[0, :3] = False
    bias = jnp.asarray(np.where(keep, 0.0, -2.0 ** 30).astype(np.float32))

    got = int8_decode_attention(
        q.astype(jnp.bfloat16), kq, ks, vq, vs, kbq=kbq, kbs=kbs,
        vbq=vbq, vbs=vbs, flag_q=flag_q, kv_flag=kv_flag, bias=bias,
        interpret=True)

    def deq(qv, s):
        # head-major -> sequence-major (B, S, H, d) for bridged_attention
        return (qv.astype(jnp.float32) * s[..., None]).transpose(0, 2, 1, 3)

    want = bridged_attention(
        AttentionInputs(q, deq(kq, ks), deq(vq, vs),
                        deq(kbq, kbs) if use_bridge else None,
                        deq(vbq, vbs) if use_bridge else None),
        jnp.broadcast_to(flag_q[:, None], (B, 1)), kv_flag,
        bias[:, None, None, :])
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("use_bridge", [True, False])
@pytest.mark.parametrize("N", [4, 16])
def test_int8_decode_attention_qblock(use_bridge, N):
    """Query blocks with in-block causality carried in a per-query
    (B, N, S) bias: Nq=4 (the spec-decode verify shape) and Nq=16 (the
    merged chunked-prefill window family, 8-multiples up to 64)."""
    from libra_tpu.ops.pallas.decode_attention import int8_decode_attention

    B, S, H, d = 2, 128, 8, 128
    rng = np.random.RandomState(7)

    def qbuf(seed):
        x = np.random.RandomState(seed).randn(B, H, S, d).astype(np.float32)
        a = np.abs(x).max(-1, keepdims=True)
        scale = np.where(a > 0, a, 1.0) / 127.0
        qv = np.clip(np.round(x / scale), -127, 127).astype(np.int8)
        return jnp.asarray(qv), jnp.asarray(scale[..., 0])

    kq, ks = qbuf(11)
    vq, vs = qbuf(12)
    kbq, kbs = qbuf(13) if use_bridge else (None, None)
    vbq, vbs = qbuf(14) if use_bridge else (None, None)
    q = jnp.asarray(rng.randn(B, N, H, d).astype(np.float32))
    flag_q = jnp.asarray(rng.rand(B, N) < 0.5)
    kv_flag = jnp.asarray(rng.rand(B, S) < 0.4)
    # queries occupy slots [96, 96 + N): causal + padding per query row
    keep = np.zeros((B, N, S), bool)
    for i in range(N):
        keep[:, i, : 96 + i + 1] = True
    keep[0, :, :3] = False
    bias = jnp.asarray(np.where(keep, 0.0, -2.0 ** 30).astype(np.float32))

    got = int8_decode_attention(
        q.astype(jnp.bfloat16), kq, ks, vq, vs, kbq=kbq, kbs=kbs,
        vbq=vbq, vbs=vbs, flag_q=flag_q, kv_flag=kv_flag, bias=bias,
        interpret=True)

    def deq(qv, s):
        return (qv.astype(jnp.float32) * s[..., None]).transpose(0, 2, 1, 3)

    want = bridged_attention(
        AttentionInputs(q, deq(kq, ks), deq(vq, vs),
                        deq(kbq, kbs) if use_bridge else None,
                        deq(vbq, vbs) if use_bridge else None),
        flag_q, kv_flag, bias[:, None])
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=3e-2, atol=3e-2)
