"""End-to-end parity: reference-named torch state dict -> checkpoint
converter -> libra_tpu forward must match the independent torch oracle
logit-for-logit (fp32)."""

import jax
import jax.numpy as jnp
import numpy as np

from libra_tpu.checkpoint import convert_libra_state_dict
from libra_tpu.config import LibraConfig
from libra_tpu.models import libra as M

from tests.test_core_model import make_inputs
from tests.torch_oracle import make_reference_state_dict, oracle_forward


def test_logit_parity_with_torch_oracle():
    cfg = LibraConfig.tiny()
    sd = make_reference_state_dict(cfg, seed=0)

    ids, mask, vi, sig = make_inputs(cfg, B=2)
    mask = np.ones_like(np.asarray(mask))  # oracle path: no padding
    ids_np = np.asarray(ids)
    vi_np = np.asarray(vi)
    sig_np = np.asarray(sig)

    want_text, want_vis = oracle_forward(sd, cfg, ids_np, mask, vi_np, sig_np)

    sd_np = {k: v.numpy() for k, v in sd.items()}
    params = convert_libra_state_dict(sd_np, cfg)

    @jax.jit
    def fwd(params, ids, mask, vi, sig):
        out = M.forward(params, cfg, ids, mask, vi, sig)
        return (M.compute_text_logits(params, out.hidden_states),
                M.compute_vision_logits(params, out.hidden_states))

    got_text, got_vis = fwd(params, jnp.asarray(ids_np), jnp.asarray(mask),
                            jnp.asarray(vi_np), jnp.asarray(sig_np))

    np.testing.assert_allclose(np.asarray(got_text), want_text,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_vis), want_vis,
                               rtol=2e-4, atol=2e-4)
