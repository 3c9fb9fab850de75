"""Native runtime: C++ shard reader with background readahead.

Builds lazily with g++ on first use; NativeShardStream yields the same
sample dicts as libra_tpu.data.webdata.ShardStream (which remains the pure
Python fallback). The C++ thread parses tars, groups samples, and maintains
the shuffle reservoir; Python only decodes images and tokenizes.
"""

from __future__ import annotations

import ctypes
import io
import json
import logging
import subprocess
from pathlib import Path
from typing import Any, Dict, Iterator, Optional

logger = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "shard_reader.cpp"
_LIB = Path(__file__).parent / "libshard_reader.so"


class _LsrSample(ctypes.Structure):
    _fields_ = [
        ("key", ctypes.c_char_p),
        ("jpg", ctypes.POINTER(ctypes.c_uint8)),
        ("jpg_len", ctypes.c_uint64),
        ("json", ctypes.POINTER(ctypes.c_uint8)),
        ("json_len", ctypes.c_uint64),
        ("owner", ctypes.c_void_p),
    ]


def build_library(force: bool = False) -> Path:
    if _LIB.exists() and not force and \
            _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           "-o", str(_LIB), str(_SRC), "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


_lib_handle = None


def _load():
    global _lib_handle
    if _lib_handle is None:
        lib = ctypes.CDLL(str(build_library()))
        lib.lsr_open.restype = ctypes.c_void_p
        lib.lsr_open.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                 ctypes.c_int, ctypes.c_ulong,
                                 ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.lsr_next.restype = ctypes.c_int
        lib.lsr_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(_LsrSample)]
        lib.lsr_free_sample.argtypes = [ctypes.POINTER(_LsrSample)]
        lib.lsr_close.argtypes = [ctypes.c_void_p]
        _lib_handle = lib
    return _lib_handle


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception as e:  # noqa: BLE001
        logger.warning("native shard reader unavailable: %r", e)
        return False


class NativeShardStream:
    """Drop-in for webdata.ShardStream backed by the C++ reader."""

    def __init__(self, location, *, shuffle_bufsize: int = 5000,
                 queue_depth: int = 256, seed: int = 0,
                 resample: bool = True, map_fn=None,
                 deterministic: bool = True, shuffle_initial: int = 0,
                 process_index=None, process_count=None):
        from libra_tpu.data.webdata import (expand_shards, fold_process_seed,
                                            resolve_process)
        self.shards = expand_shards(location)
        if not self.shards:
            raise FileNotFoundError(f"no shards match {location}")
        # http(s) sources stream through a curl pipe (the C++ reader's
        # remote path is popen; pipe: shards pass through unchanged).
        # shlex.quote: the URL reaches a shell via popen -- unquoted
        # metacharacters in an untrusted shard list would be command
        # injection (ADVICE r2 finding 1)
        import shlex
        self.shards = [f"pipe:curl -fsSL {shlex.quote(s)}"
                       if s.startswith(("http://", "https://")) else s
                       for s in self.shards]
        pi, pc = resolve_process(process_index, process_count)
        if not resample and pc > 1:
            split = self.shards[pi::pc]
            if split:
                self.shards = split
        self.shuffle_bufsize = shuffle_bufsize
        self.queue_depth = queue_depth
        self.seed = fold_process_seed(seed, pi) if deterministic else 0
        self.resample = resample
        self.map_fn = map_fn

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        from PIL import Image
        lib = _load()
        arr = (ctypes.c_char_p * len(self.shards))(
            *[s.encode() for s in self.shards])
        h = lib.lsr_open(arr, len(self.shards), self.seed,
                         self.shuffle_bufsize, self.queue_depth,
                         1 if self.resample else 0)
        if not h:
            raise RuntimeError("lsr_open failed")
        s = _LsrSample()
        try:
            while True:
                rc = lib.lsr_next(h, ctypes.byref(s))
                if rc != 0:
                    return
                try:
                    out: Dict[str, Any] = {
                        "__key__": s.key.decode(errors="replace")}
                    if s.jpg_len:
                        jpg = ctypes.string_at(s.jpg, s.jpg_len)
                        out["jpg"] = Image.open(io.BytesIO(jpg)).convert("RGB")
                    if s.json_len:
                        out["json"] = json.loads(
                            ctypes.string_at(s.json, s.json_len))
                    if self.map_fn is not None:
                        out = self.map_fn(out)
                    if out is not None:
                        yield out
                except Exception as e:  # noqa: BLE001
                    logger.warning("sample failed: %r -- skipping", e)
                finally:
                    lib.lsr_free_sample(ctypes.byref(s))
        finally:
            lib.lsr_close(h)
