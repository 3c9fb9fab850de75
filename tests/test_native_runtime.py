"""Native C++ shard reader tests: build, stream, parity with the Python
reader, and corrupt-shard resilience."""

import numpy as np
import pytest

from libra_tpu import runtime
from libra_tpu.data.webdata import ShardStream

from tests.test_data_layer import _make_shard


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    d = tmp_path_factory.mktemp("nshards")
    _make_shard(d / "shard-000.tar", n=5, seed=0)
    _make_shard(d / "shard-001.tar", n=5, seed=1)
    (d / "corrupt.tar").write_bytes(b"this is not a tar file" * 40)
    return d


def test_native_builds():
    assert runtime.native_available()


def test_native_stream_samples(shards):
    stream = runtime.NativeShardStream(
        str(shards / "shard-00*.tar"), shuffle_bufsize=4, seed=0,
        resample=False)
    out = list(stream)
    assert len(out) == 10
    keys = {s["__key__"] for s in out}
    assert len(keys) == 10
    for s in out:
        assert s["jpg"].mode == "RGB"
        assert "caption" in s["json"]


def test_native_matches_python_keys(shards):
    """Both readers must surface the same sample set (order differs)."""
    native = {s["__key__"] for s in runtime.NativeShardStream(
        str(shards / "shard-00*.tar"), resample=False, seed=1)}
    python = set()
    ps = ShardStream(str(shards / "shard-00*.tar"), shuffle_bufsize=4,
                     shuffle_initial=1, seed=1, resample=False)
    for s in ps:
        python.add(s["__key__"])
    assert native == python


def test_native_corrupt_shard_skipped(shards):
    stream = runtime.NativeShardStream(
        [str(shards / "corrupt.tar"), str(shards / "shard-000.tar")],
        resample=False, seed=0)
    out = list(stream)
    assert len(out) == 5  # corrupt shard contributes nothing, no crash


def test_native_resample_infinite(shards):
    stream = runtime.NativeShardStream(
        str(shards / "shard-00*.tar"), shuffle_bufsize=8, seed=0,
        resample=True)
    it = iter(stream)
    got = [next(it) for _ in range(25)]  # more than one epoch's worth
    assert len(got) == 25
