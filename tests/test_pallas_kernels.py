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
