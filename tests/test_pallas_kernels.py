"""Pallas kernel parity tests (interpret mode on CPU)."""

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


def test_int4_matmul_interpret():
    """int4 pack/dequant bounds and kernel parity (interpret mode)."""
    import jax
    import jax.numpy as jnp
    from libra_tpu.ops.pallas.int4_matmul import (dequant_int4, int4_matmul,
                                                  pack_int4)

    rng = np.random.RandomState(0)
    w = rng.randn(256, 384).astype(np.float32)
    p, s = pack_int4(w, group=64)
    assert p.dtype == jnp.uint8 and p.shape == (128, 384)
    assert s.shape == (4, 384)
    wd = np.asarray(dequant_int4(p, s, group=64))
    err = np.abs(wd - w).reshape(4, 64, 384)
    amax = np.abs(w.reshape(4, 64, 384)).max(1, keepdims=True)
    assert (err <= amax / 14 + 1e-6).all()

    wd16 = dequant_int4(p, s, group=64, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.randn(3, 256), jnp.bfloat16)
    xe, xo = x[:, 0::2], x[:, 1::2]
    want = (jax.lax.dot(xe, wd16[0::2],
                        preferred_element_type=jnp.float32)
            + jax.lax.dot(xo, wd16[1::2],
                          preferred_element_type=jnp.float32))
    got = int4_matmul(x, p, s, group=64, block_o=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want),
        rtol=1e-2, atol=1e-2)   # output is bf16
