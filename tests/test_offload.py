"""ZeRO-Offload equivalent: optimizer state in pinned host memory must give
bit-identical training to the on-device path."""

import jax
import numpy as np
import pytest

from libra_tpu.config import LibraConfig
from libra_tpu.models import libra as M
from libra_tpu.parallel import make_mesh
from libra_tpu.training.optimizer import OptimizerConfig
from libra_tpu.training.trainer import Trainer

from tests.test_sharding_training import make_batch


def test_offload_opt_state_parity():
    cfg = LibraConfig.tiny()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    oc = OptimizerConfig(total_steps=10, warmup_ratio=0.0, learning_rate=1e-3)
    batch = make_batch(cfg, B=4)

    t_off = Trainer(cfg, params, make_mesh(1, 2, 2), oc,
                    offload_opt_state=True)
    t_reg = Trainer(cfg, params, make_mesh(1, 2, 2), oc)
    for _ in range(2):
        m_off = t_off.step(batch)
        m_reg = t_reg.step(batch)
    np.testing.assert_allclose(float(m_off["loss"]), float(m_reg["loss"]),
                               rtol=1e-6)
    # moment matrices really live in host memory
    leaves = [l for l in jax.tree_util.tree_leaves(t_off.state.opt_state)
              if l.ndim >= 2]
    assert leaves and all(
        l.sharding.memory_kind == "pinned_host" for l in leaves)
