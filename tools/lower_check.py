"""Per-kernel TPU-lowering smoke checks at every production shape family.

VERDICT r3 weak #2: all Pallas tests ran interpret-only, so a kernel whose
BlockSpecs Mosaic can never tile (the r3 flash_bridge) passed 100% of CI
and killed every serving/chat bench stage at runtime. This module is the
fix, used two ways:

 1. On TPU (bench.py's FIRST stage / `python tools/lower_check.py`):
    `jax.jit(...).lower()` each kernel wrapper at each shape family --
    lowering only, never dispatched, seconds per case, cannot wedge the
    axon tunnel. Pallas/Mosaic tiling validation runs during lowering.
 2. On CPU (tests/test_kernel_lowering.py): trace each case to a jaxpr,
    pull the real `grid_mapping.block_mappings` off the pallas_call
    equation, and assert every block's last-two dims satisfy Mosaic's
    tiling rule (multiple of the dtype's sublane tile x 128, or the full
    dim). A structural proxy that catches the r3 bug class without TPU.

Shape families covered (see each case): serving prefill buckets, the
ragged 610-token VQA prompt, chat delta prefill, no-bridge prefill,
stacked int8 decode attention at Nq=1 and the spec-decode Nq<=8 verify
block, per-slot (unstacked) decode, and the stacked int8/int4 matvecs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

S = jax.ShapeDtypeStruct


def _flash_case(B, Nq, Nk, H=32, d=128, bridge=True, block_q=None):
    from libra_tpu.models.libra import _choose_block_q
    from libra_tpu.ops.pallas.flash_bridge import flash_bridged_attention

    bq = block_q if block_q is not None else _choose_block_q(Nq)
    assert bq is not None, (Nq, "no flash block -- case is XLA-path")

    def fn(q, k, v, kb, vb, fq, fk, bias):
        return flash_bridged_attention(
            q, k, v, kb if bridge else None, vb if bridge else None,
            fq, fk, bias, block_q=bq)

    args = (S((B, Nq, H, d), jnp.bfloat16),
            S((B, Nk, H, d), jnp.bfloat16),
            S((B, Nk, H, d), jnp.bfloat16),
            S((B, Nk, H, d), jnp.bfloat16),
            S((B, Nk, H, d), jnp.bfloat16),
            S((B, Nq), jnp.bool_), S((B, Nk), jnp.bool_),
            S((B, 1, Nq, Nk), jnp.float32))
    return fn, args


def _flash_bwd_case(B, Nq, Nk, H=32, d=128, bridge=True):
    """Backward (custom VJP) of the flash kernel: grad wrt q/k/v[/kb/vb].
    Covers the fused backward kernel's BlockSpecs, incl. the zero-padded
    ragged-Nq path (_bwd_impl pads e.g. the 698-token fused-pretrain
    sequence to 768 with block_q=128). The forward block_q mirrors the
    production choice (models.libra._choose_block_q: full-dim for ragged
    Nq); the backward picks its own block internally."""
    from libra_tpu.models.libra import _choose_block_q
    from libra_tpu.ops.pallas.flash_bridge import flash_bridged_attention

    bq = _choose_block_q(Nq)
    assert bq is not None, (Nq, "no flash block -- case is XLA-path")

    def fn(q, k, v, kb, vb, fq, fk, bias):
        def loss(*diff):
            o = flash_bridged_attention(
                diff[0], diff[1], diff[2],
                diff[3] if bridge else None, diff[4] if bridge else None,
                fq, fk, bias, block_q=bq)
            return jnp.sum(o.astype(jnp.float32))
        diff = (q, k, v, kb, vb) if bridge else (q, k, v)
        return jax.grad(loss, argnums=tuple(range(len(diff))))(*diff)

    args = (S((B, Nq, H, d), jnp.bfloat16),
            S((B, Nk, H, d), jnp.bfloat16),
            S((B, Nk, H, d), jnp.bfloat16),
            S((B, Nk, H, d), jnp.bfloat16),
            S((B, Nk, H, d), jnp.bfloat16),
            S((B, Nq), jnp.bool_), S((B, Nk), jnp.bool_),
            S((B, 1, Nq, Nk), jnp.float32))
    return fn, args


def _decode_case(B, Sk, N, H=32, d=128, bridge=True, L=None):
    from libra_tpu.ops.pallas.decode_attention import int8_decode_attention

    kv = (B, H, Sk, d) if L is None else (L, B, H, Sk, d)
    sc = (B, H, Sk) if L is None else (L, B, H, Sk)

    def fn(q, kq, ks, vq, vs, kbq, kbs, vbq, vbs, fq, fkv, bias, li):
        return int8_decode_attention(
            q, kq, ks, vq, vs,
            kbq=kbq if bridge else None, kbs=kbs if bridge else None,
            vbq=vbq if bridge else None, vbs=vbs if bridge else None,
            flag_q=fq, kv_flag=fkv, bias=bias,
            layer_idx=li if L is not None else None)

    args = (S((B, N, H, d), jnp.bfloat16),
            S(kv, jnp.int8), S(sc, jnp.float32),
            S(kv, jnp.int8), S(sc, jnp.float32),
            S(kv, jnp.int8), S(sc, jnp.float32),
            S(kv, jnp.int8), S(sc, jnp.float32),
            S((B, N), jnp.bool_), S((B, Sk), jnp.bool_),
            S((B, N, Sk), jnp.float32), S((), jnp.int32))
    return fn, args


def _int8_matmul_case(M=4, K=4096, F=11008, L=32):
    from libra_tpu.ops.pallas.int8_matmul import int8_matmul

    def fn(x, q, s, i):
        return int8_matmul(x, q, s, idx=i)

    return fn, (S((M, K), jnp.bfloat16), S((L, K, F), jnp.int8),
                S((L, 1, F), jnp.float32), S((), jnp.int32))


def _int4_matmul_case(M=4, K=4096, F=11008, L=None, a8=False):
    from libra_tpu.ops.pallas.int4_matmul import int4_matmul

    if L is None:
        def fn(x, p, s):
            return int4_matmul(x, p, s, a8=a8)
        return fn, (S((M, K), jnp.bfloat16), S((K // 2, F), jnp.int8),
                    S((K // 128, F), jnp.float32))

    def fn(x, p, s, i):
        return int4_matmul(x, p, s, idx=i, a8=a8)
    return fn, (S((M, K), jnp.bfloat16), S((L, K // 2, F), jnp.int8),
                S((L, K // 128, F), jnp.float32), S((), jnp.int32))


def cases():
    """[(name, fn, abstract_args)] -- every production shape family."""
    out = []

    def add(name, mk, *a, **kw):
        fn, args = mk(*a, **kw)
        out.append((name, fn, args))

    # flash prefill: serving 640-bucket @ max_len 768 (bench_serving)
    add("flash_serving_640x768", _flash_case, 4, 640, 768)
    # ragged VQA prompt (610 = 32 text + 578 image): FULL-dim q block
    add("flash_vqa_ragged_610", _flash_case, 4, 610, 768)
    # chat turn-2 delta: 64-bucket against the 1024-slot resident cache
    add("flash_chat_delta_64x1024", _flash_case, 4, 64, 1024)
    # uncached prefill (Nk == Nq), the Generator's non-cache fast path
    add("flash_prefill_nocache_640", _flash_case, 1, 640, 640)
    # no-bridge (LLaMA-family / lang-only prompts)
    add("flash_nobridge_256", _flash_case, 2, 256, 256, bridge=False)
    # spec-decode verify fallback on an UNquantized cache: tiny full block
    add("flash_specverify_ragged_5", _flash_case, 4, 5, 768, block_q=5)

    # fused flash BACKWARD (training attention): the fused-pretrain shape
    # (698 = 120 text + 578 image -> ragged: _bwd_impl zero-pads to 768,
    # block_q=128) and a divisible no-bridge shape (block_q direct)
    add("flash_bwd_train_698", _flash_bwd_case, 8, 698, 698)
    add("flash_bwd_nobridge_256", _flash_bwd_case, 2, 256, 256,
        bridge=False)

    # fused int8 decode attention: stacked layer-scan path (the default
    # full-32 decode), Nq=1 and the spec-decode verify block
    add("decode_stacked_n1", _decode_case, 4, 768, 1, L=32)
    add("decode_stacked_spec_n4", _decode_case, 4, 768, 4, L=32)
    add("decode_stacked_chat_s1024", _decode_case, 4, 1024, 1, L=32)
    # merged chunked-prefill window (serving): Nq = merged_chunk = 64
    add("decode_stacked_merged_n64", _decode_case, 4, 768, 64, L=32)
    # per-slot / per-layer (unstacked) form, no bridge
    add("decode_unstacked_plain_n1", _decode_case, 1, 768, 1, bridge=False)

    # weight-streaming matvecs (qlinear dispatch shapes)
    add("int8_matvec_stacked", _int8_matmul_case)
    # token-packed merged-prefill activation rows: M = B + C (C=128 at
    # B=4 -> 132, B=8 -> 136; gate is M <= 160)
    add("int8_matmul_packed_m132", _int8_matmul_case, 132)
    add("int8_matmul_packed_m160", _int8_matmul_case, 160)
    add("int4_matvec", _int4_matmul_case)
    # production int4 serving mode: W4A8 stacked, O padded to bo=1024
    # (quantization._int4_pad_o lifts 11008 -> 11264)
    add("int4_matvec_a8_stacked", _int4_matmul_case, 4, 4096, 11264,
        L=32, a8=True)
    return out


def lower_all(verbose: bool = True):
    """jit-lower every case on the current default backend (TPU in
    production). Raises on the first failure; returns #cases."""
    import time
    n = 0
    for name, fn, args in cases():
        t0 = time.perf_counter()
        jax.jit(fn).lower(*args)
        n += 1
        if verbose:
            print(f"  lower[{jax.default_backend()}] {name}: "
                  f"ok ({time.perf_counter() - t0:.1f}s)", flush=True)
    return n


# ---------------------------------------------------------------------
# CPU structural proxy: Mosaic's block-tiling rule on traced BlockSpecs
# ---------------------------------------------------------------------

_SUBLANE = {1: 32, 2: 16, 4: 8}      # itemsize -> sublane tile (x128 lanes)


def _block_dims(bm):
    """Concrete (block, full) for each NON-squeezed dim of a BlockMapping."""
    full = list(bm.array_aval.shape)
    dims = []
    for i, b in enumerate(bm.block_shape):
        if type(b).__name__ == "Squeezed":
            dims.append((None, full[i]))
        else:
            dims.append((getattr(b, "block_size", b), full[i]))
    return dims


def check_block_mapping(bm) -> list:
    """Mosaic tiling rule on the last two NON-squeezed dims: each must be
    the full dim, or a multiple of the dtype tile (sublane x 128).
    A squeezed dim whose full size > 1 sitting in the last-two window is
    exactly the r3 flash_bridge bug: the effective block dim is 1 there.
    Returns a list of violation strings (empty = ok)."""
    dt = bm.array_aval.dtype
    sub = _SUBLANE.get(jnp.dtype(dt).itemsize, 8)
    dims = _block_dims(bm)
    errs = []
    window = dims[-2:] if len(dims) >= 2 else dims
    for pos, (blk, full) in enumerate(window):
        tile = 128 if pos == len(window) - 1 else sub
        eff = 1 if blk is None else blk
        if blk is None and full == 1:
            continue                      # squeezed singleton: fine
        if eff == full or eff % tile == 0:
            continue
        errs.append(f"block dim {eff} (full {full}, dtype {dt}, "
                    f"tile {tile}) in window {window}")
    return errs


def check_all_specs():
    """Trace every case on CPU and assert tiling on every BlockMapping
    (recursing through pjit/scan sub-jaxprs). Returns #pallas_call
    equations checked; raises AssertionError with all violations."""
    from jax.extend.core import ClosedJaxpr, Jaxpr

    checked = 0
    errors = []

    def visit(jaxpr, name):
        nonlocal checked
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "pallas_call":
                checked += 1
                for bm in eqn.params["grid_mapping"].block_mappings:
                    for e in check_block_mapping(bm):
                        errors.append(f"{name}: {e}")
            for p in eqn.params.values():
                if isinstance(p, ClosedJaxpr):
                    visit(p.jaxpr, name)
                elif isinstance(p, Jaxpr):
                    visit(p, name)

    for name, fn, args in cases():
        visit(jax.make_jaxpr(fn)(*args).jaxpr, name)
    assert checked >= len(cases()), f"only {checked} pallas_calls traced"
    assert not errors, "\n".join(errors)
    return checked


if __name__ == "__main__":
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    n = lower_all()
    print(f"all {n} kernel shape families lower on "
          f"{jax.default_backend()}")
