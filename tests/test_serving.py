"""Continuous-batching serving engine v2: per-slot recycling timelines.
Each request's greedy tokens must equal a standalone Generator run under
slot reuse, staggered lengths, tensor parallelism, int8 weights/KV and the
2D prediction/RoPE modes."""

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


def _requests(cfg, n, seed=0, max_new=None):
    reqs = []
    for i in range(n):
        text_len = 3 + 2 * (i % 4)
        ids, mask, vi, sig = make_inputs(cfg, B=1, text_len=text_len,
                                         seed=seed + i)
        mask = jnp.ones_like(mask)       # engine requests are unpadded
        reqs.append((Request(request_id=i,
                             input_ids=np.asarray(ids[:, 0]),
                             vision_indices=np.asarray(vi[0]),
                             contiguous_signal=np.asarray(sig[0]),
                             max_new_tokens=max_new or (4 + i % 5)),
                     {"input_ids": ids, "attention_mask": mask,
                      "vision_indices": vi, "coninous_signal": sig}))
    return reqs


def _check_parity(results, pairs, params, cfg, gen_kw=None, gen=None):
    g = gen or Generator(params, cfg)
    for res, (req, inputs) in zip(results, pairs):
        want = g(inputs, GenerationConfig(
            max_new_tokens=req.max_new_tokens, eos_token_id=-1,
            **(gen_kw or {})))
        N = req.input_ids.shape[-1]
        want_toks = np.asarray(want.sequences)[:, 0, N:]
        np.testing.assert_array_equal(res.tokens, want_toks,
                                      err_msg=f"request {res.request_id}")


def test_engine_matches_generator(tiny):
    cfg, params = tiny
    gen = GenerationConfig(eos_token_id=-1)   # run to max_new (no EOS)
    pairs = _requests(cfg, 3)
    eng = ServingEngine(params, cfg, max_batch=2, max_len=128, gen=gen)
    results = eng.run([r for r, _ in pairs])
    assert [r.request_id for r in results] == [0, 1, 2]
    assert all(r.finish_reason == "length" for r in results)
    _check_parity(results, pairs, params, cfg)


def test_engine_slots_recycle_far_past_max_len(tiny):
    """The v2 point: slots recycle indefinitely -- total generated tokens
    across the run far exceed the per-slot capacity, with exact per-request
    parity throughout."""
    cfg, params = tiny
    gen = GenerationConfig(eos_token_id=-1)
    max_len = 32
    pairs = _requests(cfg, 10, max_new=6)
    eng = ServingEngine(params, cfg, max_batch=2, max_len=max_len, gen=gen)
    results = eng.run([r for r, _ in pairs])
    assert len(results) == 10
    total_prompt = sum(r.input_ids.shape[-1] for r, _ in pairs)
    total_generated = sum(r.tokens.shape[-1] for r in results)
    assert total_generated == 60
    assert total_prompt + total_generated > 3 * max_len  # >> one timeline
    _check_parity(results, pairs, params, cfg)


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

    # capacity is now PER-REQUEST: prompt + max_new must fit one slot
    ids_len = req.input_ids.shape[-1]
    eng2 = ServingEngine(params, cfg, max_batch=1, max_len=ids_len + 3,
                         gen=GenerationConfig(eos_token_id=-1))
    fits = Request(request_id=1, input_ids=req.input_ids,
                   vision_indices=req.vision_indices,
                   contiguous_signal=req.contiguous_signal,
                   max_new_tokens=3)
    too_big = Request(request_id=2, input_ids=req.input_ids,
                      vision_indices=req.vision_indices,
                      contiguous_signal=req.contiguous_signal,
                      max_new_tokens=4)
    out = eng2.run([fits, too_big])
    assert out[0].finish_reason == "length"
    assert out[0].tokens.shape[-1] == 3
    assert out[1].finish_reason == "capacity"
    assert out[1].tokens.shape[-1] == 0


def test_engine_prompt_bucketing(tiny):
    """prompt_bucket bounds the prefill compile cache (one program per
    bucket, not per exact length) with EXACT parity: left bucket padding is
    masked out of attention and positions."""
    cfg, params = tiny
    gen = GenerationConfig(eos_token_id=-1)
    pairs = _requests(cfg, 4)         # prompt lengths 3+2i + image block
    eng = ServingEngine(params, cfg, max_batch=2, max_len=64, gen=gen,
                        prompt_bucket=8)
    results = eng.run([r for r, _ in pairs])
    assert all(n % 8 == 0 for n, _, _ in eng._prefill_fns)
    lengths = {r.input_ids.shape[-1] for r, _ in pairs}
    assert len(eng._prefill_fns) < len(lengths)   # cache actually bounded
    _check_parity(results, pairs, params, cfg)


def test_engine_tensor_parallel(tiny):
    """Mesh-sharded engine (TP over heads + head-sharded KV cache) emits
    exactly the single-device tokens."""
    from libra_tpu.parallel import make_mesh

    cfg, params = tiny
    gen = GenerationConfig(eos_token_id=-1)
    pairs = _requests(cfg, 4)
    mesh = make_mesh(data=1, fsdp=2, model=4)
    eng = ServingEngine(params, cfg, max_batch=2, max_len=64, gen=gen,
                        mesh=mesh)
    q_sh = eng.params["layers"]["attn"]["q_proj"].sharding
    assert q_sh.spec[-1] == "model"
    results = eng.run([r for r, _ in pairs])
    _check_parity(results, pairs, params, cfg)


def test_engine_int8_weights_and_kv(tiny):
    """int8 weights + int8 KV cache: the engine must match a Generator run
    with the SAME quantized params and kv_quant (bitwise-identical cache
    math -> identical tokens)."""
    from libra_tpu.quantization import quantize_params

    cfg, params = tiny
    qparams = quantize_params(params, min_elems=0)
    gen = GenerationConfig(eos_token_id=-1, kv_quant=True)
    pairs = _requests(cfg, 3)
    eng = ServingEngine(qparams, cfg, max_batch=2, max_len=64, gen=gen)
    results = eng.run([r for r, _ in pairs])
    g = Generator(qparams, cfg)
    _check_parity(results, pairs, params, cfg, gen_kw={"kv_quant": True},
                  gen=g)


def test_engine_2d_mode(tiny):
    """2D vision-prediction mode: the per-slot hidden ring must reproduce
    Generator's tokens (which are oracle-checked in test_2d_mode)."""
    cfg2d = LibraConfig.tiny(vision_prediction_mode="2d")
    params = M.init_params(jax.random.PRNGKey(1), cfg2d)
    gen = GenerationConfig(eos_token_id=-1)
    pairs = _requests(cfg2d, 3)
    eng = ServingEngine(params, cfg2d, max_batch=2, max_len=64, gen=gen)
    results = eng.run([r for r, _ in pairs])
    _check_parity(results, pairs, params, cfg2d)


def test_engine_2d_rope(tiny):
    """2D-RoPE checkpoints: the engine carries the (base, offset) position
    state instead of 1D position ids."""
    cfg2r = LibraConfig.tiny(use_2d_rope=True)
    params = M.init_params(jax.random.PRNGKey(2), cfg2r)
    gen = GenerationConfig(eos_token_id=-1)
    pairs = _requests(cfg2r, 3)
    eng = ServingEngine(params, cfg2r, max_batch=2, max_len=64, gen=gen)
    results = eng.run([r for r, _ in pairs])
    _check_parity(results, pairs, params, cfg2r)


def test_engine_pixels_request_matches_preencoded(tiny):
    """Raw-pixels requests (fused CLIP+VQGAN encode inside the prefill
    program) emit exactly the tokens of the same request pre-encoded on
    the host (VERDICT r3 item 4 done-bar)."""
    from libra_tpu.config import VQGANConfig
    from libra_tpu.data.caption_format import IMG_PH
    from libra_tpu.models import vqgan as vqgan_model
    from libra_tpu.tokenization import (ImageTokenizer, LibraTokenizer,
                                        SimpleTextTokenizer)

    cfg, params = tiny
    vq_cfg = VQGANConfig.tiny()
    vq_params = vqgan_model.init_params(jax.random.PRNGKey(1), vq_cfg)
    text_tok = SimpleTextTokenizer(vocab_size=cfg.vocab_size)
    img_tok = ImageTokenizer(vq_cfg, vq_params, token_offset=cfg.vocab_size,
                             max_vision_token_length=cfg.max_vision_token_length)
    joint = LibraTokenizer(text_tok, img_tok)
    Mv = cfg.max_vision_token_length

    img = np.random.RandomState(0).randn(28, 28, 3).astype(np.float32)
    prompt = " ".join([IMG_PH] * Mv) + " describe:"

    # pre-encoded request (host-side tokenization)
    pre = joint([{"language": [prompt], "vision": [img]}])
    req_a = Request(request_id=0,
                    input_ids=np.asarray(pre["input_ids"])[:, 0],
                    vision_indices=np.asarray(pre["vision_indices"])[0],
                    contiguous_signal=np.asarray(pre["coninous_signal"])[0],
                    max_new_tokens=5)

    # raw-pixels request (placeholder ids; encode runs in prefill)
    t = text_tok([prompt])
    ids = np.asarray(t["input_ids"], np.int64)
    pos = int(np.nonzero(ids[0] == text_tok.img_ph_token_id)[0][0])
    vi = np.full(ids.shape[-1], Mv, np.int64)
    vi[pos:pos + Mv] = np.arange(Mv)
    req_b = Request(request_id=0,
                    input_ids=np.broadcast_to(
                        ids, (cfg.vision_codebook_num, ids.shape[-1])),
                    vision_indices=vi, max_new_tokens=5,
                    pixels=img, img_start=pos)

    gen = GenerationConfig(eos_token_id=-1)
    eng_a = ServingEngine(params, cfg, max_batch=1, max_len=64, gen=gen)
    eng_b = ServingEngine(params, cfg, max_batch=1, max_len=64, gen=gen,
                          vq_params=vq_params, vq_cfg=vq_cfg)
    res_a = eng_a.run([req_a])[0]
    res_b = eng_b.run([req_b])[0]
    np.testing.assert_array_equal(res_b.tokens, res_a.tokens)

    # pixels without vq params is a clear error
    with pytest.raises(ValueError):
        eng_a.run([req_b])


def test_engine_chunked_decode_and_ttft(tiny):
    """Chunk boundaries (decode_chunk=3) preserve exact parity across
    mid-chunk finishes and refills; every served request reports a TTFT."""
    cfg, params = tiny
    gen = GenerationConfig(eos_token_id=-1)
    pairs = _requests(cfg, 6)                 # max_new 4..8: mid-chunk ends
    eng = ServingEngine(params, cfg, max_batch=2, max_len=64, gen=gen,
                        decode_chunk=3)
    results = eng.run([r for r, _ in pairs])
    assert len(results) == 6
    assert all(r.ttft_s is not None and r.ttft_s >= 0 for r in results)
    _check_parity(results, pairs, params, cfg)


def test_engine_2d_short_prompt_ring(tiny):
    """2D mode with a prompt shorter than R-1: the hidden ring is left-
    padded with zeros instead of crashing/shrinking (ADVICE r2 finding 3),
    and the engine still matches the Generator."""
    cfg2d = LibraConfig.tiny(vision_prediction_mode="2d",
                             image_feature_resolution=4,
                             max_vision_token_length=18,
                             vision_vocab_size=20)
    params = M.init_params(jax.random.PRNGKey(3), cfg2d)
    # 2-token text-only prompt < R-1 = 3
    rng = np.random.RandomState(0)
    ids = rng.randint(3, cfg2d.vocab_size,
                      size=(cfg2d.vision_codebook_num, 2)).astype(np.int64)
    vi = np.full((2,), cfg2d.max_vision_token_length, np.int64)
    req = Request(request_id=0, input_ids=ids, vision_indices=vi,
                  max_new_tokens=4)
    gen = GenerationConfig(eos_token_id=-1)
    eng = ServingEngine(params, cfg2d, max_batch=1, max_len=64, gen=gen)
    res = eng.run([req])[0]
    assert res.tokens.shape == (cfg2d.vision_codebook_num, 4)

    want = Generator(params, cfg2d)(
        {"input_ids": ids[:, None], "attention_mask": np.ones((1, 2)),
         "vision_indices": vi[None]},
        GenerationConfig(max_new_tokens=4, eos_token_id=-1))
    np.testing.assert_array_equal(
        res.tokens, np.asarray(want.sequences)[:, 0, 2:])


def test_engine_pixels_without_vq_params_rejected_up_front(tiny):
    """An engine built without vq_params must reject a pixels request at
    run() ENTRY: raising mid-stream from the scheduling loop would discard
    every already-completed Result (r3 review finding)."""
    cfg, params = tiny
    pairs = _requests(cfg, 1)
    ok_req, _ = pairs[0]
    px = Request(request_id=9,
                 input_ids=ok_req.input_ids,
                 vision_indices=ok_req.vision_indices,
                 pixels=np.zeros((3, 8, 8), np.float32), img_start=1,
                 max_new_tokens=2)
    eng = ServingEngine(params, cfg, max_batch=1, max_len=64,
                        gen=GenerationConfig(eos_token_id=-1))
    # pixels request LAST: the up-front check must still fire before any
    # prefill/decode work happens on the valid head-of-queue request
    with pytest.raises(ValueError, match="vq_params"):
        eng.run([ok_req, px])
    assert eng._prefill_fns == {}    # no work started before the raise


def test_engine_t2i_request_generates_image_block(tiny):
    """A t2i-shaped request (prompt ending at BOI) decodes through the
    engine's dual-path body (auto-resolved for the stream) and matches the
    Generator token-for-token, emitting vision-vocab tokens."""
    cfg, params = tiny
    Mv = cfg.max_vision_token_length
    rng = np.random.RandomState(7)
    N = 5
    ids = rng.randint(3, cfg.vocab_size,
                      size=(cfg.vision_codebook_num, 1, N)).astype(np.int64)
    ids[:, :, -1] = cfg.vocab_size + cfg.vision_vocab_size - 2   # BOI
    vi = np.full((1, N), Mv, np.int64)
    vi[:, -1] = 0
    sig = np.zeros((1, N, cfg.contiguous_signal_size), np.float32)
    max_new = Mv - 1 + 2          # finish the block, cross EOI into text
    req = Request(request_id=0, input_ids=ids[:, 0],
                  vision_indices=vi[0], contiguous_signal=sig[0],
                  max_new_tokens=max_new)
    gen = GenerationConfig(eos_token_id=-1)
    eng = ServingEngine(params, cfg, max_batch=1, max_len=64, gen=gen)
    res = eng.run([req])[0]
    assert list(eng._decode_fns) == [False]       # dual-path body

    want = Generator(params, cfg)(
        {"input_ids": ids, "attention_mask": np.ones((1, N), np.int64),
         "vision_indices": vi, "coninous_signal": sig},
        GenerationConfig(max_new_tokens=max_new, eos_token_id=-1))
    want_toks = np.asarray(want.sequences)[:, 0, N:N + max_new]
    np.testing.assert_array_equal(res.tokens, want_toks)
    # the completed image block is vision-vocab; EOI is the block's last id
    assert (res.tokens[:, :Mv - 1] >= cfg.vocab_size).all()


def test_engine_poisson_arrivals(tiny):
    """Open-loop load: requests carry arrival_s offsets. The scheduler
    admits each only after its arrival, per-request tokens still match a
    standalone Generator run exactly, and TTFT is measured from ARRIVAL
    (every ttft_s is set and non-negative)."""
    cfg, params = tiny
    gen = GenerationConfig(eos_token_id=-1)
    pairs = _requests(cfg, 6, max_new=4)
    for i, (req, _) in enumerate(pairs):
        req.arrival_s = 0.03 * i
    eng = ServingEngine(params, cfg, max_batch=2, max_len=128, gen=gen)
    results = eng.run([r for r, _ in pairs])
    assert [r.request_id for r in results] == list(range(6))
    assert all(r.ttft_s is not None and r.ttft_s >= 0 for r in results)
    _check_parity(results, pairs, params, cfg)


def test_engine_idle_gap_arrival(tiny):
    """A request arriving AFTER the pool drains: the scheduler sleeps
    through the idle gap, admits it on arrival, and its tokens are exact.
    The late request's TTFT excludes its own arrival offset."""
    cfg, params = tiny
    gen = GenerationConfig(eos_token_id=-1)
    pairs = _requests(cfg, 2, max_new=3)
    pairs[1][0].arrival_s = 1.5    # far beyond request 0's finish on CPU?
    # (tiny-config CPU steps are ms-scale only when jitted+warm; the gap
    # just needs to be > 0 -- correctness must not depend on its size)
    eng = ServingEngine(params, cfg, max_batch=2, max_len=128, gen=gen)
    results = eng.run([r for r, _ in pairs])
    assert [r.request_id for r in results] == [0, 1]
    assert results[1].ttft_s is not None
    _check_parity(results, pairs, params, cfg)


def test_engine_pixels_shape_validated_up_front(tiny):
    """Pixels whose shape doesn't match the engine's CLIP input are
    rejected before any work starts (a mid-run shape error would discard
    every completed Result), as is building an engine with vq_params but
    no vq_cfg."""
    from libra_tpu.config import VQGANConfig
    from libra_tpu.models import vqgan as vqgan_model

    cfg, params = tiny
    vq_cfg = VQGANConfig.tiny()
    vq_params = vqgan_model.init_params(jax.random.PRNGKey(1), vq_cfg)
    with pytest.raises(ValueError, match="together"):
        ServingEngine(params, cfg, max_batch=1, max_len=64,
                      vq_params=vq_params)

    eng = ServingEngine(params, cfg, max_batch=1, max_len=64,
                        gen=GenerationConfig(eos_token_id=-1),
                        vq_params=vq_params, vq_cfg=vq_cfg)
    Mv = cfg.max_vision_token_length
    N = Mv + 2
    bad = Request(request_id=0,
                  input_ids=np.ones((cfg.vision_codebook_num, N), np.int64),
                  vision_indices=np.full((N,), Mv, np.int64),
                  max_new_tokens=2,
                  pixels=np.zeros((20, 20, 3), np.float32), img_start=0)
    with pytest.raises(ValueError, match="pixels shape"):
        eng.run([bad])
    assert eng._prefill_fns == {}    # nothing compiled before the raise


def test_engine_spec_decode_matches_standard(tiny):
    """gen.spec_decode=gamma turns the decode chunk into draft+verify
    iterations (>= 1 token per slot per iteration). Greedy text streams
    must match the standard engine token-for-token, through slot refills
    (the per-slot token-history rows feeding the bigram drafter are
    rewritten on refill)."""
    import dataclasses

    cfg, params = tiny
    pairs = _requests(cfg, 6, max_new=6)
    gen = GenerationConfig(eos_token_id=-1, decode_modality="text")
    eng_std = ServingEngine(params, cfg, max_batch=2, max_len=128, gen=gen)
    eng_spec = ServingEngine(params, cfg, max_batch=2, max_len=128,
                             gen=dataclasses.replace(gen, spec_decode=2))
    r_std = eng_std.run([r for r, _ in pairs])
    r_spec = eng_spec.run([r for r, _ in pairs])
    assert [r.request_id for r in r_spec] == list(range(6))
    for a, b in zip(r_std, r_spec):
        np.testing.assert_array_equal(b.tokens, a.tokens,
                                      err_msg=f"request {a.request_id}")
    _check_parity(r_spec, pairs, params, cfg,
                  gen_kw={"decode_modality": "text"})


def test_engine_spec_decode_eos(tiny):
    """EOS inside an accepted block truncates exactly where the standard
    engine stops (device cnt truncation == host replay)."""
    import dataclasses

    cfg, params = tiny
    pairs = _requests(cfg, 2, max_new=8)
    gen0 = GenerationConfig(eos_token_id=-1, decode_modality="text")
    probe = ServingEngine(params, cfg, max_batch=2, max_len=128, gen=gen0)
    r_probe = probe.run([r for r, _ in pairs])
    eos = int(r_probe[0].tokens[0, 3])   # token the model will emit
    gen = GenerationConfig(eos_token_id=eos, decode_modality="text")
    eng_std = ServingEngine(params, cfg, max_batch=2, max_len=128, gen=gen)
    eng_spec = ServingEngine(params, cfg, max_batch=2, max_len=128,
                             gen=dataclasses.replace(gen, spec_decode=3))
    r_std = eng_std.run([r for r, _ in pairs])
    r_spec = eng_spec.run([r for r, _ in pairs])
    for a, b in zip(r_std, r_spec):
        np.testing.assert_array_equal(b.tokens, a.tokens)
        assert b.finish_reason == a.finish_reason


def test_engine_spec_decode_rejects_non_text(tiny):
    """Spec decode is greedy text-mode only: sampling and dual-modality
    configs are rejected at construction; an 'auto' stream ending inside
    an image block is rejected up front."""
    import dataclasses

    cfg, params = tiny
    Mv = cfg.max_vision_token_length
    base = GenerationConfig(eos_token_id=-1, spec_decode=2)
    with pytest.raises(ValueError, match="greedy"):
        ServingEngine(params, cfg, max_batch=1, max_len=64,
                      gen=dataclasses.replace(base, do_sample=True,
                                              temperature=1.0))
    with pytest.raises(ValueError, match="text-mode"):
        ServingEngine(params, cfg, max_batch=1, max_len=64,
                      gen=dataclasses.replace(base,
                                              decode_modality="dual"))
    eng = ServingEngine(params, cfg, max_batch=1, max_len=64, gen=base)
    N = 5
    ids = np.ones((cfg.vision_codebook_num, N), np.int64)
    vi = np.full((N,), Mv, np.int64)
    vi[-1] = 2                       # ends inside an image block
    req = Request(request_id=0, input_ids=ids, vision_indices=vi,
                  max_new_tokens=2)
    with pytest.raises(ValueError, match="text-mode"):
        eng.run([req])


def test_engine_spec_decode_int8_kv(tiny):
    """Spec decode over the int8 head-major KV cache (the verify block
    writes per-slot quantized K/V at vector indices): parity with the
    standard int8-KV engine."""
    import dataclasses

    cfg, params = tiny
    pairs = _requests(cfg, 4, max_new=5)
    gen = GenerationConfig(eos_token_id=-1, decode_modality="text",
                           kv_quant=True)
    eng_std = ServingEngine(params, cfg, max_batch=2, max_len=128, gen=gen)
    eng_spec = ServingEngine(params, cfg, max_batch=2, max_len=128,
                             gen=dataclasses.replace(gen, spec_decode=2))
    r_std = eng_std.run([r for r, _ in pairs])
    r_spec = eng_spec.run([r for r, _ in pairs])
    for a, b in zip(r_std, r_spec):
        np.testing.assert_array_equal(b.tokens, a.tokens)


# -- merged chunked prefill (v5) ---------------------------------------------


def test_engine_merged_prefill_matches_generator(tiny):
    """Merged chunked prefill: refills are installed into the merged decode
    chunk (C prompt tokens per iteration riding the decode weight stream)
    instead of dedicated prefill dispatches, with exact per-request parity.
    Staggered max_new keeps the pool busy whenever a slot frees, so the
    merged path is genuinely exercised (asserted via engine stats)."""
    cfg, params = tiny
    gen = GenerationConfig(eos_token_id=-1)
    pairs = _requests(cfg, 6)            # staggered max_new 4..8
    eng = ServingEngine(params, cfg, max_batch=2, max_len=64, gen=gen,
                        prompt_bucket=8, decode_chunk=3,
                        merged_prefill=True, merged_chunk=8)
    results = eng.run([r for r, _ in pairs])
    assert eng.stats["merged_installs"] > 0, eng.stats
    assert eng.stats["merged_chunks"] > 0, eng.stats
    assert eng.stats["dedicated_prefills"] > 0, eng.stats  # cold start
    assert all(r.ttft_s is not None for r in results)
    _check_parity(results, pairs, params, cfg)


def test_engine_warmup_compiles_every_program(tiny):
    """warmup(example) compiles the decode chunk, the merged
    install/chunk programs AND every dedicated-prefill group size -- incl.
    the k<max_batch idle-pool refill shapes only open-loop arrivals hit
    (an unwarmed k=1 full-32 refill measured an ~18 s compile head-of-line
    inside the r4 Poisson run). A subsequent run stays exact."""
    cfg, params = tiny
    gen = GenerationConfig(eos_token_id=-1)
    pairs = _requests(cfg, 4)
    eng = ServingEngine(params, cfg, max_batch=4, max_len=64, gen=gen,
                        prompt_bucket=8, decode_chunk=3, merged_chunk=8)
    eng.warmup(pairs[0][0])
    assert eng.stats["dedicated_prefills"] >= len(eng._group_sizes)
    assert eng.stats["merged_installs"] > 0, eng.stats
    # a compiled dedicated-prefill program exists for every group size
    assert {k[2] for k in eng._prefill_fns} >= set(eng._group_sizes), \
        (set(eng._prefill_fns), eng._group_sizes)
    results = eng.run([r for r, _ in pairs])
    _check_parity(results, pairs, params, cfg)


def test_engine_merged_prefill_int8_kv(tiny):
    """Merged installs over the int8 KV cache: the chunk forward writes
    quantized K/V at per-row windows exactly like the wide prefill."""
    from libra_tpu.quantization import quantize_params

    cfg, params = tiny
    qparams = quantize_params(params, min_elems=0)
    gen = GenerationConfig(eos_token_id=-1, kv_quant=True)
    pairs = _requests(cfg, 5)
    eng = ServingEngine(qparams, cfg, max_batch=2, max_len=64, gen=gen,
                        prompt_bucket=8, merged_prefill=True,
                        merged_chunk=8)
    results = eng.run([r for r, _ in pairs])
    assert eng.stats["merged_installs"] > 0, eng.stats
    g = Generator(qparams, cfg)
    _check_parity(results, pairs, params, cfg,
                  gen_kw={"kv_quant": True}, gen=g)


def test_engine_merged_prefill_dual_decode(tiny):
    """Merged mode composes with dual-modality decode (multi-codebook
    sampling, vision-index advance): decode rows run the same full-path
    body the chunk rows need."""
    cfg, params = tiny
    gen = GenerationConfig(eos_token_id=-1, decode_modality="dual")
    pairs = _requests(cfg, 5)
    eng = ServingEngine(params, cfg, max_batch=2, max_len=64, gen=gen,
                        prompt_bucket=8, merged_prefill=True,
                        merged_chunk=8)
    results = eng.run([r for r, _ in pairs])
    assert eng.stats["merged_installs"] > 0, eng.stats
    _check_parity(results, pairs, params, cfg,
                  gen_kw={"decode_modality": "dual"})


def test_engine_merged_prefill_eos_and_streaming(tiny):
    """EOS fired by a merged-installed request finishes it mid-chunk; the
    on_token stream reports every token in order with correct finals."""
    cfg, params = tiny
    pairs = _requests(cfg, 4)
    g = Generator(params, cfg)
    req0, inputs0 = pairs[2]
    # the token request 2 greedily emits SECOND becomes the EOS
    want = np.asarray(g(inputs0, GenerationConfig(
        max_new_tokens=2, eos_token_id=-1)).sequences)
    eos = int(want[0, 0, -1])

    events = []
    eng = ServingEngine(params, cfg, max_batch=2, max_len=64,
                        gen=GenerationConfig(eos_token_id=eos),
                        prompt_bucket=8, merged_prefill=True,
                        merged_chunk=8)
    results = eng.run([r for r, _ in pairs],
                      on_token=lambda rid, tok, fin: events.append(
                          (rid, None if tok is None else tuple(tok), fin)))
    by_req = {r.request_id: r for r in results}
    for rid, res in by_req.items():
        ev = [e for e in events if e[0] == rid]
        assert len(ev) == max(res.tokens.shape[-1], 1)
        finals = [e for e in ev if e[2] is not None]
        assert len(finals) == 1 and finals[0] is ev[-1]
        assert finals[0][2] == res.finish_reason
    # at least one request actually ended on EOS
    assert any(r.finish_reason == "eos" for r in results)


def test_engine_merged_fallback_when_bucket_incompatible(tiny):
    """Requests whose bucketed length is not a C-multiple (or engines
    without headroom) silently keep the dedicated prefill path."""
    cfg, params = tiny
    gen = GenerationConfig(eos_token_id=-1)
    pairs = _requests(cfg, 4)
    eng = ServingEngine(params, cfg, max_batch=2, max_len=64, gen=gen,
                        prompt_bucket=4, merged_prefill=True,
                        merged_chunk=8)   # Nb in {12, 16, 20}: mixed
    results = eng.run([r for r, _ in pairs])
    _check_parity(results, pairs, params, cfg)
    # spec decode / 2D modes refuse forced merged mode
    with pytest.raises(ValueError):
        ServingEngine(params, cfg, max_batch=2, max_len=64,
                      gen=GenerationConfig(eos_token_id=-1, spec_decode=2),
                      merged_prefill=True)


def test_engine_prefill_group_cap(tiny):
    """max_prefill_group bounds grouped-refill program width (full-scale
    k=8 prompt programs crash the remote TPU compiler) with exact parity."""
    cfg, params = tiny
    gen = GenerationConfig(eos_token_id=-1)
    pairs = _requests(cfg, 6, max_new=4)
    eng = ServingEngine(params, cfg, max_batch=4, max_len=64, gen=gen,
                        max_prefill_group=2)
    assert max(eng._group_sizes) == 2
    results = eng.run([r for r, _ in pairs])
    assert all(k[2] <= 2 for k in eng._prefill_fns)
    _check_parity(results, pairs, params, cfg)


def test_engine_merged_mixed_with_pixels_fallback(tiny):
    """Raw-pixels requests (dedicated-prefill only) coexist with
    merged-installed text requests in the same pool, with exact parity
    for both."""
    from libra_tpu.config import VQGANConfig
    from libra_tpu.models import vqgan as vqgan_model

    cfg, params = tiny
    vq_cfg = VQGANConfig.tiny()
    vq_params = vqgan_model.init_params(jax.random.PRNGKey(1), vq_cfg)
    Mv = cfg.max_vision_token_length
    gen = GenerationConfig(eos_token_id=-1)

    pairs = _requests(cfg, 5)
    reqs = [r for r, _ in pairs]
    # request 2 becomes a raw-pixels request with the same prompt shape:
    # placeholder ids at the image block, pixels carried
    img = np.random.RandomState(3).randn(28, 28, 3).astype(np.float32)
    base = reqs[2]
    vi = np.asarray(base.vision_indices)
    pos = int(np.nonzero(vi == 0)[0][0])
    reqs[2] = Request(request_id=2, input_ids=np.asarray(base.input_ids),
                      vision_indices=vi, max_new_tokens=base.max_new_tokens,
                      pixels=img, img_start=pos)

    eng = ServingEngine(params, cfg, max_batch=2, max_len=64, gen=gen,
                        prompt_bucket=8, merged_prefill=True, merged_chunk=8,
                        vq_params=vq_params, vq_cfg=vq_cfg)
    results = eng.run(reqs)
    assert eng.stats["merged_installs"] > 0, eng.stats
    assert eng.stats["dedicated_prefills"] > 1, eng.stats  # pixels refill
    # text requests: exact parity with the Generator
    g = Generator(params, cfg)
    for i in (0, 1, 3, 4):
        res = results[i]
        req, inputs = pairs[i]
        want = g(inputs, GenerationConfig(
            max_new_tokens=req.max_new_tokens, eos_token_id=-1))
        N = req.input_ids.shape[-1]
        np.testing.assert_array_equal(
            res.tokens, np.asarray(want.sequences)[:, 0, N:])
    # pixels request: parity with a fused-vision Generator run
    gv = Generator(params, cfg, vq_params=vq_params, vq_cfg=vq_cfg)
    want = gv({"input_ids": np.asarray(base.input_ids)[:, None],
               "attention_mask": np.ones((1, vi.shape[-1]), np.int32),
               "vision_indices": vi[None], "pixels": img[None],
               "img_start": np.asarray([pos], np.int32)},
              GenerationConfig(max_new_tokens=base.max_new_tokens,
                               eos_token_id=-1))
    N = base.input_ids.shape[-1]
    np.testing.assert_array_equal(
        results[2].tokens, np.asarray(want.sequences)[:, 0, N:])


def test_engine_int4_weights(tiny):
    """Group-int4 weight tree (quantize='int4' serving mode) through the
    engine: must match a Generator run with the SAME int4 tree (identical
    dequant math -> identical tokens). Uses 256-wide dims so projections
    actually become Quantized4Array (tiny 64-dim shapes fall back to
    int8)."""
    from libra_tpu.quantization import Quantized4Array, quantize_params

    cfg = LibraConfig.tiny(hidden_size=256, intermediate_size=256,
                           num_attention_heads=2)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params(params, min_elems=0, bits=4, group=64)
    assert isinstance(qparams["layers"]["attn"]["q_proj"], Quantized4Array)
    gen = GenerationConfig(eos_token_id=-1, kv_quant=True)
    pairs = _requests(cfg, 3)
    eng = ServingEngine(qparams, cfg, max_batch=2, max_len=64, gen=gen)
    results = eng.run([r for r, _ in pairs])
    g = Generator(qparams, cfg)
    _check_parity(results, pairs, params, cfg, gen_kw={"kv_quant": True},
                  gen=g)
