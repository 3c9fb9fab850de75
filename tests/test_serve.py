"""HTTP serving front-end: request building, scheduler waves, and the
full HTTP round-trip must produce exactly the pipeline's own answers."""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from libra_tpu.config import LibraConfig, VQGANConfig
from libra_tpu.data.processors import LibraEvalImageProcessor
from libra_tpu.models import libra as M, vqgan as vqgan_model
from libra_tpu.pipeline import LibraPipeline
from libra_tpu.serve import ServeApp, make_server
from libra_tpu.tokenization import (ImageTokenizer, LibraTokenizer,
                                    SimpleTextTokenizer)


@pytest.fixture(scope="module")
def pipe():
    cfg = LibraConfig.tiny()
    vq_cfg = VQGANConfig.tiny()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    vq_params = vqgan_model.init_params(jax.random.PRNGKey(1), vq_cfg)
    text_tok = SimpleTextTokenizer(vocab_size=cfg.vocab_size)
    img_tok = ImageTokenizer(vq_cfg, vq_params, token_offset=cfg.vocab_size,
                             max_vision_token_length=cfg.max_vision_token_length)
    proc = LibraEvalImageProcessor(vq_cfg.clip)
    return LibraPipeline(cfg, params, LibraTokenizer(text_tok, img_tok),
                         image_processor=proc)


@pytest.fixture(scope="module")
def app(pipe):
    a = ServeApp(pipe, max_batch=2, max_len=96, prompt_bucket=16,
                 decode_chunk=4, max_new_default=4)
    yield a
    a.close()


def test_handle_text_matches_pipeline(pipe, app):
    q = "what is the capital"
    want = pipe.chat([q], max_new_tokens=4)[0]
    out = app.handle({"prompt": q, "max_new_tokens": 4}, timeout=300)
    assert out["text"] == want
    assert out["finish_reason"] in ("eos", "length")
    assert out["ttft_s"] is None or out["ttft_s"] >= 0


def test_handle_image_matches_pipeline(pipe, app):
    from PIL import Image
    img = Image.fromarray(np.random.RandomState(0)
                          .randint(0, 255, (40, 40, 3), np.uint8))
    q = "describe this"
    want = pipe.chat([q], images=[img], max_new_tokens=4)[0]
    pixels = np.asarray(pipe.image_processor(img))
    out = app.handle({"prompt": q, "pixels": pixels.tolist(),
                      "max_new_tokens": 4}, timeout=300)
    assert out["text"] == want


def test_http_roundtrip_concurrent(pipe, app):
    srv = make_server(app, "127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.loads(r.read())["ok"] is True

        qs = ["first question", "second question", "third question"]
        want = [pipe.chat([q], max_new_tokens=4)[0] for q in qs]
        got = [None] * len(qs)

        def post(i):
            body = json.dumps({"prompt": qs[i],
                               "max_new_tokens": 4}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/generate", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                got[i] = json.loads(r.read())["text"]

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(len(qs))]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        assert got == want
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_bad_request(app):
    srv = make_server(app, "127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps({"max_new_tokens": 4}).encode()   # no prompt
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/generate", data=body,
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 400
    finally:
        srv.shutdown()
        srv.server_close()


def test_stream_deltas_match_handle(pipe, app):
    q = "stream me an answer"
    want = app.handle({"prompt": q, "max_new_tokens": 4}, timeout=300)
    evs = list(app.stream({"prompt": q, "max_new_tokens": 4}, timeout=300))
    assert evs[-1]["finish_reason"] in ("eos", "length")
    text = "".join(e["delta"] for e in evs[:-1])
    assert text == want["text"]
    assert evs[-1]["text"] == want["text"]


def test_http_sse_stream(pipe, app):
    srv = make_server(app, "127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        q = "tell me about streams"
        want = pipe.chat([q], max_new_tokens=4)[0]
        body = json.dumps({"prompt": q, "max_new_tokens": 4,
                           "stream": True}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/generate", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.headers["Content-Type"] == "text/event-stream"
            events = [json.loads(line[len(b"data: "):])
                      for line in r.read().split(b"\n")
                      if line.startswith(b"data: ")]
        assert events[-1]["text"] == want
        assert "".join(e.get("delta", "") for e in events[:-1]) == want
    finally:
        srv.shutdown()
        srv.server_close()
