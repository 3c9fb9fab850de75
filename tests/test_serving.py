"""Continuous-batching serving engine: each request's greedy tokens must
equal a standalone Generator run, under slot reuse and staggered lengths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libra_tpu.config import LibraConfig
from libra_tpu.generation import GenerationConfig, Generator
from libra_tpu.models import libra as M
from libra_tpu.serving import Request, ServingEngine

from tests.test_core_model import make_inputs


@pytest.fixture(scope="module")
def tiny():
    cfg = LibraConfig.tiny()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _requests(cfg, n, seed=0):
    reqs = []
    for i in range(n):
        text_len = 3 + 2 * i
        ids, mask, vi, sig = make_inputs(cfg, B=1, text_len=text_len,
                                         seed=seed + i)
        mask = jnp.ones_like(mask)       # engine requests are unpadded
        reqs.append((Request(request_id=i,
                             input_ids=np.asarray(ids[:, 0]),
                             vision_indices=np.asarray(vi[0]),
                             contiguous_signal=np.asarray(sig[0]),
                             max_new_tokens=4 + i),
                     {"input_ids": ids, "attention_mask": mask,
                      "vision_indices": vi, "coninous_signal": sig}))
    return reqs


def test_engine_matches_generator(tiny):
    cfg, params = tiny
    gen = GenerationConfig(eos_token_id=-1)   # run to max_new (no EOS)
    pairs = _requests(cfg, 3)
    eng = ServingEngine(params, cfg, max_batch=2, max_len=128, gen=gen)
    results = eng.run([r for r, _ in pairs])
    assert [r.request_id for r in results] == [0, 1, 2]

    g = Generator(params, cfg)
    for res, (req, inputs) in zip(results, pairs):
        assert res.finish_reason == "length"
        want = g(inputs, GenerationConfig(
            max_new_tokens=req.max_new_tokens, eos_token_id=-1))
        N = req.input_ids.shape[-1]
        want_toks = np.asarray(want.sequences)[:, 0, N:]
        np.testing.assert_array_equal(res.tokens, want_toks,
                                      err_msg=f"request {res.request_id}")


def test_engine_eos_and_capacity(tiny):
    cfg, params = tiny
    # find which token a greedy run emits first, use it as "EOS"
    pairs = _requests(cfg, 1)
    g = Generator(params, cfg)
    req, inputs = pairs[0]
    first = int(np.asarray(g(inputs, GenerationConfig(
        max_new_tokens=1, eos_token_id=-1)).sequences)[0, 0, -1])

    eng = ServingEngine(params, cfg, max_batch=1, max_len=64,
                        gen=GenerationConfig(eos_token_id=first))
    res = eng.run([req])[0]
    assert res.finish_reason == "eos"
    assert res.tokens.shape[-1] == 1 and res.tokens[0, 0] == first

    # capacity: timeline too small for the second request
    ids_len = req.input_ids.shape[-1]
    eng2 = ServingEngine(params, cfg, max_batch=1, max_len=ids_len + 3,
                         gen=GenerationConfig(eos_token_id=-1))
    req2 = Request(request_id=1, input_ids=req.input_ids,
                   vision_indices=req.vision_indices,
                   contiguous_signal=req.contiguous_signal,
                   max_new_tokens=2)
    out = eng2.run([req, req2])
    assert out[0].finish_reason in ("length", "capacity")
    assert out[1].finish_reason == "capacity"
    assert out[1].tokens.shape[-1] == 0
