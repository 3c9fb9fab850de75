"""Multi-host data sharding + remote shard sources (VERDICT r1 items 5, 9).

* pipe:/http(s) shard URLs stream through both the Python and the C++
  readers (the reference's wds.ResampledShards accepts URLs/pipes,
  laion_dataset.py:61);
* per-process stream splitting: each host gets a distinct seed (resampled
  mode) or a disjoint stride of the shard list (sequential mode) -- the
  reference gives every torchrun rank its own resampled stream;
* a genuine 2-process jax.distributed CPU run proving disjoint streams and
  an identical (psum-reduced) train step on a global 2-device mesh.
"""

import os
import socket
import subprocess
import sys
import textwrap
import threading

import numpy as np
import pytest

from libra_tpu.data.webdata import ShardStream, expand_shards, fold_process_seed

from tests.test_data_layer import _make_shard


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    d = tmp_path_factory.mktemp("mhshards")
    for i in range(4):
        _make_shard(d / f"shard-{i:03d}.tar", n=5, seed=i)
    return d


def _keys(stream, n=None):
    out = []
    for s in stream:
        out.append(s["__key__"])
        if n is not None and len(out) >= n:
            break
    return out


# -- remote sources ----------------------------------------------------------

def test_pipe_source_matches_local(shards):
    local = set(_keys(ShardStream(str(shards / "shard-000.tar"),
                                  shuffle_bufsize=2, shuffle_initial=1,
                                  seed=0, resample=False,
                                  process_index=0, process_count=1)))
    piped = set(_keys(ShardStream(f"pipe:cat {shards}/shard-000.tar",
                                  shuffle_bufsize=2, shuffle_initial=1,
                                  seed=0, resample=False,
                                  process_index=0, process_count=1)))
    assert piped == local and len(piped) == 5


def test_pipe_source_error_skips(shards):
    """A failing pipe command must skip-and-continue, not crash."""
    stream = ShardStream(
        [f"pipe:false", str(shards / "shard-000.tar")],
        shuffle_bufsize=2, shuffle_initial=1, seed=0, resample=False,
        process_index=0, process_count=1)
    assert len(_keys(stream)) == 5


def test_http_source(shards):
    import functools
    import http.server

    handler = functools.partial(http.server.SimpleHTTPRequestHandler,
                                directory=str(shards))
    with http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler) as srv:
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{port}/shard-000.tar"
            assert expand_shards(url) == [url]
            got = set(_keys(ShardStream(url, shuffle_bufsize=2,
                                        shuffle_initial=1, seed=0,
                                        resample=False, process_index=0,
                                        process_count=1)))
            assert len(got) == 5
        finally:
            srv.shutdown()


def test_native_pipe_source(shards):
    from libra_tpu import runtime

    if not runtime.native_available():
        pytest.skip("native reader unavailable")
    local = {s["__key__"] for s in runtime.NativeShardStream(
        str(shards / "shard-000.tar"), resample=False, seed=0,
        process_index=0, process_count=1)}
    piped = {s["__key__"] for s in runtime.NativeShardStream(
        f"pipe:cat {shards}/shard-000.tar", resample=False, seed=0,
        process_index=0, process_count=1)}
    assert piped == local and len(piped) == 5


# -- per-process splitting ---------------------------------------------------

def test_sequential_split_disjoint(shards):
    loc = str(shards / "shard-*.tar")
    s0 = ShardStream(loc, resample=False, seed=3, shuffle_bufsize=2,
                     shuffle_initial=1, process_index=0, process_count=2)
    s1 = ShardStream(loc, resample=False, seed=3, shuffle_bufsize=2,
                     shuffle_initial=1, process_index=1, process_count=2)
    k0, k1 = set(_keys(s0)), set(_keys(s1))
    assert k0 and k1
    assert not (k0 & k1)          # disjoint shard coverage
    assert len(k0 | k1) == 20     # together they cover everything


def test_resampled_streams_differ_per_process(shards):
    loc = str(shards / "shard-*.tar")
    k0 = _keys(ShardStream(loc, resample=True, seed=3, shuffle_bufsize=4,
                           shuffle_initial=2, process_index=0,
                           process_count=2), n=12)
    k1 = _keys(ShardStream(loc, resample=True, seed=3, shuffle_bufsize=4,
                           shuffle_initial=2, process_index=1,
                           process_count=2), n=12)
    assert k0 != k1               # distinct per-host sample order
    assert fold_process_seed(3, 0) != fold_process_seed(3, 1)


# -- genuine 2-process jax.distributed run ------------------------------------

_WORKER = textwrap.dedent("""
    import os, sys, json
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]; shard_glob = sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2

    # disjoint per-host streams resolve process identity from jax itself
    from libra_tpu.data.webdata import ShardStream
    keys = []
    for s in ShardStream(shard_glob, resample=False, shuffle_bufsize=2,
                         shuffle_initial=1, seed=0):
        keys.append(s["__key__"])

    # one DP train step over the global 2-device mesh from per-process
    # local batch shards
    import numpy as np, jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from libra_tpu.config import LibraConfig
    from libra_tpu.models import libra as M
    import functools, optax
    from libra_tpu.training.trainer import init_state, train_step

    cfg = LibraConfig.tiny()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    opt = optax.sgd(1e-3)
    mesh = Mesh(np.asarray(jax.devices()).reshape(2), ("data",))
    rng = np.random.RandomState(pid)
    B, N, Q = 1, 8, cfg.vision_codebook_num
    ids = rng.randint(3, cfg.vocab_size, size=(Q, B, N)).astype(np.int32)
    ids[1:] = ids[0]
    local = {
        "input_ids": ids,
        "attention_mask": np.ones((B, N), np.int32),
        "vision_indices": np.full((B, N), cfg.max_vision_token_length,
                                  np.int32),
        "coninous_signal": np.zeros((B, N, cfg.contiguous_signal_size),
                                    np.float32),
        "labels": ids.astype(np.int32),
    }
    gb = {k: jax.make_array_from_process_local_data(
             NamedSharding(mesh, P("data") if k in ("attention_mask",
                 "vision_indices", "coninous_signal")
                 else P(None, "data")), v)
          for k, v in local.items()}
    with jax.set_mesh(mesh):
        state = jax.jit(functools.partial(init_state, opt=opt))(params)
        step = jax.jit(functools.partial(train_step, cfg=cfg, opt=opt))
        state, metrics = step(state, gb)
        loss = float(metrics["loss"])
    print("RESULT " + json.dumps({"pid": pid, "keys": keys, "loss": loss}),
          flush=True)
""")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_disjoint_and_converged(shards, tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(port),
         str(shards / "shard-*.tar")],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd="/root/repo") for i in range(2)]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        import json as _json
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = _json.loads(line[len("RESULT "):])
                results[r["pid"]] = r
    assert set(results) == {0, 1}
    k0, k1 = set(results[0]["keys"]), set(results[1]["keys"])
    assert k0 and k1 and not (k0 & k1)      # disjoint per-host streams
    assert len(k0 | k1) == 20
    # lockstep SPMD: both processes compute the SAME global loss
    assert np.isfinite(results[0]["loss"])
    assert results[0]["loss"] == results[1]["loss"]
