"""Small-surface modules: EMA transform and dist helpers."""

import jax
import jax.numpy as jnp
import numpy as np

from libra_tpu.common import dist
from libra_tpu.training.ema import EMAState, init_ema, update_ema


def test_ema_update_math():
    params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    state = init_ema(params)
    assert int(state.count) == 0

    new = {"w": jnp.full((4,), 3.0), "b": jnp.ones((2,))}
    state = jax.jit(lambda s, p: update_ema(s, p, decay=0.9,
                                            warmup=False))(state, new)
    np.testing.assert_allclose(np.asarray(state.ema["w"]),
                               0.9 * 1.0 + 0.1 * 3.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state.ema["b"]), 0.1, rtol=1e-6)
    assert int(state.count) == 1

    # warmup: d_1 = min(decay, 2/11)
    s2 = jax.jit(lambda s, p: update_ema(s, p, decay=0.999))(
        init_ema(params), new)
    d = 2.0 / 11.0
    np.testing.assert_allclose(np.asarray(s2.ema["w"]), d + (1 - d) * 3.0,
                               rtol=1e-5)


def test_dist_helpers_single_process():
    assert dist.get_world_size() == 1
    assert dist.get_rank() == 0
    assert dist.is_main_process()
    assert not dist.is_dist_avail_and_initialized()
    dist.init_distributed_mode()   # no coordinator -> no-op
