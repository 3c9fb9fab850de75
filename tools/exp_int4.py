"""Experiment: can int4 weight streaming beat the int8 kernel at decode?

The shipped int4 kernel (ops/pallas/int4_matmul.py) is VPU-unpack-bound:
341 GB/s of int4 bytes vs the int8 kernel's 715 GB/s -- same wall time,
so int4 currently only halves memory, not latency. Hypotheses tested
here on the real chip, (4096, 11008) decode matvec:

  A. baseline: shipped packed-uint8 kernel (int32 nibble unpack).
  B. native int4 ref: store weights as jnp.int4 (logical (K, O), 4-bit
     storage); the kernel reads w4_ref[...] and casts to bf16 -- if
     Mosaic lowers int4 loads/casts in hardware the unpack is ~free.
  C. per-group accumulator scaling on B: skip the per-element scale
     multiply; acc_o = sum_g s_g,o * dot(x_g, q_g) with one K=group dot
     per group (group=128 == the native MXU tile).

Timing: traced-loop differencing (single compile, two trip counts) --
per-call tunnel overhead is ~27 ms, so single dispatches are never timed.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

K, O = 4096, 11008
GROUP = 128


def timed_loop(fn, x0, n1=50, n2=150):
    """fn: x -> x-shaped output; returns per-call seconds."""

    @jax.jit
    def loop(x, n):
        def body(c, _):
            return fn(c), None

        out, _ = jax.lax.scan(body, x, None, length=n1)
        def body2(c, _):
            return fn(c), None
        # two loop lengths inside ONE program would double compile; use
        # two jitted programs instead, sharing the traced fn
        return out

    @functools.partial(jax.jit, static_argnames=("n",))
    def loopn(x, n):
        def body(c, _):
            return fn(c), None

        out, _ = jax.lax.scan(body, x, None, length=n)
        return out

    r1 = loopn(x0, n=n1)
    np.asarray(r1).ravel()[0]            # real readback (axon sync)
    t0 = time.perf_counter()
    r1 = loopn(x0, n=n1)
    np.asarray(r1).ravel()[0]
    t1 = time.perf_counter() - t0
    r2 = loopn(x0, n=n2)
    np.asarray(r2).ravel()[0]
    t0 = time.perf_counter()
    r2 = loopn(x0, n=n2)
    np.asarray(r2).ravel()[0]
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (n2 - n1)


def report(name, sec, eff_bytes):
    gbs = eff_bytes / sec / 1e9
    print(f"{name}: {sec * 1e3:.3f} ms  {gbs:.0f} GB/s effective",
          flush=True)


def main():
    rng = np.random.RandomState(0)
    w = rng.randn(K, O).astype(np.float32) * 0.02
    x = jnp.asarray(rng.randn(4, K), jnp.bfloat16)

    from libra_tpu.ops.pallas.int4_matmul import int4_matmul, pack_int4
    packed, scales = jax.jit(pack_int4)(w)
    packed = jax.device_put(packed)
    scales = jax.device_put(scales)
    int4_bytes = K * O // 2

    # ---- A: shipped kernel -------------------------------------------------
    sec = timed_loop(
        lambda xx: int4_matmul(xx, packed, scales)[:, :K].astype(jnp.bfloat16)
        if O >= K else xx, x)
    report("A shipped packed-uint8", sec, int4_bytes)

    # ---- B: native int4 ref ------------------------------------------------
    q4 = jnp.asarray(
        np.clip(np.round(w / np.asarray(
            jnp.repeat(scales, GROUP, axis=0))), -8, 7), jnp.int4)
    s_full = jax.device_put(scales.astype(jnp.float32))

    def kernel_b(x_ref, w_ref, s_ref, o_ref, *, n_groups, gh):
        wq = w_ref[...].astype(jnp.bfloat16)          # int4 -> bf16 cast
        bo = wq.shape[-1]
        s3 = s_ref[...].reshape(n_groups, 1, bo).astype(jnp.bfloat16)
        wd = (wq.reshape(n_groups, 2 * gh, bo) * s3).reshape(
            n_groups * 2 * gh, bo)
        o_ref[...] = jax.lax.dot(
            x_ref[...], wd, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)

    def int4_native(xx, block_o=512):
        Bp = 8
        xp = jnp.zeros((Bp, K), xx.dtype).at[:4].set(xx)
        out = pl.pallas_call(
            functools.partial(kernel_b, n_groups=K // GROUP, gh=GROUP // 2),
            grid=(O // block_o,),
            in_specs=[
                pl.BlockSpec((Bp, K), lambda j: (0, 0)),
                pl.BlockSpec((K, block_o), lambda j: (0, j)),
                pl.BlockSpec((K // GROUP, block_o), lambda j: (0, j)),
            ],
            out_specs=pl.BlockSpec((Bp, block_o), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((Bp, O), jnp.float32),
        )(xp, q4, s_full)
        return out[:4]

    try:
        y = int4_native(x)
        ref = (np.asarray(x, np.float32)
               @ np.asarray(jax.jit(lambda: q4.astype(jnp.float32)
                            * jnp.repeat(s_full, GROUP, axis=0))(),
                            np.float32))
        err = np.abs(np.asarray(y) - ref).max() / max(np.abs(ref).max(), 1e-6)
        print(f"B native-int4 rel err {err:.2e}", flush=True)
        sec = timed_loop(
            lambda xx: int4_native(xx)[:, :K].astype(jnp.bfloat16), x)
        report("B native int4 ref", sec, int4_bytes)
    except Exception as e:  # noqa: BLE001
        print("B native int4 FAILED:", repr(e)[:300], flush=True)

    # ---- C: accumulator-scaled group dots on packed uint8 ------------------
    def kernel_c(xe_ref, xo_ref, wp_ref, s_ref, o_ref, *, n_groups, gh):
        w16 = wp_ref[...].astype(jnp.int16)
        lo = (((w16 & 15) ^ 8) - 8).astype(jnp.bfloat16)
        hi = (((w16 >> 4) ^ 8) - 8).astype(jnp.bfloat16)
        bo = lo.shape[-1]
        acc = jnp.zeros((xe_ref.shape[0], bo), jnp.float32)

        def body(g, acc):
            sl = jax.lax.dynamic_slice(lo, (g * gh, 0), (gh, bo))
            sh = jax.lax.dynamic_slice(hi, (g * gh, 0), (gh, bo))
            xe = jax.lax.dynamic_slice(
                xe_ref[...], (0, g * gh), (xe_ref.shape[0], gh))
            xo = jax.lax.dynamic_slice(
                xo_ref[...], (0, g * gh), (xo_ref.shape[0], gh))
            d = (jax.lax.dot(xe, sl, preferred_element_type=jnp.float32)
                 + jax.lax.dot(xo, sh, preferred_element_type=jnp.float32))
            sg = jax.lax.dynamic_slice(s_ref[...], (g, 0), (1, bo))
            return acc + d * sg

        acc = jax.lax.fori_loop(0, n_groups, body, acc)
        o_ref[...] = acc

    def int4_groupdot(xx, block_o=512):
        Bp = 8
        xp = jnp.zeros((Bp, K), xx.dtype).at[:4].set(xx)
        xe, xo = xp[:, 0::2], xp[:, 1::2]
        out = pl.pallas_call(
            functools.partial(kernel_c, n_groups=K // GROUP, gh=GROUP // 2),
            grid=(O // block_o,),
            in_specs=[
                pl.BlockSpec((Bp, K // 2), lambda j: (0, 0)),
                pl.BlockSpec((Bp, K // 2), lambda j: (0, 0)),
                pl.BlockSpec((K // 2, block_o), lambda j: (0, j)),
                pl.BlockSpec((K // GROUP, block_o), lambda j: (0, j)),
            ],
            out_specs=pl.BlockSpec((Bp, block_o), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((Bp, O), jnp.float32),
        )(xe, xo, packed, scales.astype(jnp.float32))
        return out[:4]

    try:
        y = int4_groupdot(x)
        yA = int4_matmul(x, packed, scales)
        err = (np.abs(np.asarray(y) - np.asarray(yA, np.float32)).max()
               / max(np.abs(np.asarray(yA)).max(), 1e-6))
        print(f"C groupdot rel err vs A {err:.2e}", flush=True)
        sec = timed_loop(
            lambda xx: int4_groupdot(xx)[:, :K].astype(jnp.bfloat16), x)
        report("C groupdot packed-uint8", sec, int4_bytes)
    except Exception as e:  # noqa: BLE001
        print("C groupdot FAILED:", repr(e)[:300], flush=True)


if __name__ == "__main__":
    main()
