"""Weight-consumption dispatch: one entry point for every `x @ W` in the
model so int8 weight trees hit the fused Pallas dequant kernel on TPU.

Plain weights and non-decode shapes fall back to the XLA einsum (which
fuses the int8->bf16 upcast into the matmul read); decode-shaped int8
matmuls (tiny M, MXU-aligned K/F) stream through
ops/pallas/int8_matmul.int8_matmul at raw-int8 HBM bandwidth. Stacked
per-layer weights arrive as quantization.LayerView (full buffers + layer
index) so the kernel reads straight from the stacked HBM array instead of
a per-step sliced copy.

`kernel_enabled(False)` disables the Pallas path for a trace: pallas_call
is opaque to GSPMD, so under a tensor-parallel mesh the sharded weights
must keep the XLA path (Generator/ServingEngine set this automatically).
"""

from __future__ import annotations

import contextlib
import contextvars
import os

import jax
import jax.numpy as jnp

_KERNEL_ENABLED = contextvars.ContextVar(
    "libra_int8_kernel",
    default=os.environ.get("LIBRA_DISABLE_INT8_KERNEL", "0") != "1")

# w8a8 mode: per-token dynamic int8 activation quantization so x @ W runs
# as a native s8 x s8 -> s32 MXU dot (2x the bf16 MXU rate on v5e) with NO
# bf16 weight materialisation. Enabled per-trace around compute-bound
# regions (prefill) via a8_enabled(); decode stays on the Pallas
# dequant-matvec kernel (bandwidth-bound -- a8 buys nothing there).
_A8_ENABLED = contextvars.ContextVar("libra_a8", default=False)


@contextlib.contextmanager
def kernel_enabled(flag: bool):
    """Trace-time switch for the Pallas int8 path (see module docstring)."""
    token = _KERNEL_ENABLED.set(flag)
    try:
        yield
    finally:
        _KERNEL_ENABLED.reset(token)


@contextlib.contextmanager
def a8_enabled(flag: bool):
    """Trace-time switch: int8-weight matmuls quantize activations
    per-token and run s8 x s8 MXU dots (w8a8). Wrap compute-bound traces
    only (prefill); weight-only dequant stays exact for everything else."""
    token = _A8_ENABLED.set(flag)
    try:
        yield
    finally:
        _A8_ENABLED.reset(token)


def _a8_dot(x: jax.Array, q: jax.Array, scale: jax.Array) -> jax.Array:
    """x (..., K) float -> (..., F) via per-token symmetric int8 activation
    quantization against int8 weights q (K, F) with per-out-channel scales
    scale (1, F). y ~= (x_q @ q) * s_x * s_w computed in one s8 x s8 -> s32
    MXU dot: half the bf16 matmul time at prefill sizes AND no dequantized
    bf16 weight copy (the XLA fallback writes+rereads 2x the int8 bytes).
    Error is the standard w8a8 budget (~0.7% rel per dot; see
    tests/test_quantization.py::test_a8_dot_accuracy)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.where(amax > 0, amax, 1.0) / 127.0
    xq = jnp.round(xf / sx).astype(jnp.int8)
    yi = jax.lax.dot_general(
        xq, q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = yi.astype(jnp.float32) * sx * scale.astype(jnp.float32)[0]
    return y.astype(x.dtype)


def kernel_active() -> bool:
    """True when Pallas int8 kernels may be emitted in the current trace
    (enabled context + TPU backend)."""
    return _KERNEL_ENABLED.get() and jax.default_backend() == "tpu"


def qdot(x: jax.Array, w) -> jax.Array:
    """x @ w -> (..., F). w: plain (K, F) array, QuantizedArray with
    per-out-channel scales (scale (1, F)), Quantized4Array with group
    scales, or a LayerView of a stacked quantized weight."""
    from libra_tpu.quantization import (LayerView, Quantized4Array,
                                        QuantizedArray)

    q4 = w.qa if isinstance(w, LayerView) and isinstance(
        w.qa, Quantized4Array) else (w if isinstance(w, Quantized4Array)
                                     else None)
    if q4 is not None and kernel_active():
        from libra_tpu.ops.pallas import int4_matmul as i4
        if i4.supports(x, q4.packed, q4.scale, q4.group):
            idx = w.idx if isinstance(w, LayerView) else None
            out = i4.int4_matmul(x, q4.packed, q4.scale, group=q4.group,
                                 idx=idx, a8=q4.a8)
            if q4.out_features is not None \
                    and q4.out_features != out.shape[-1]:
                out = out[..., :q4.out_features]
            return out
    if kernel_active() and isinstance(w, (QuantizedArray, LayerView)):
        from libra_tpu.ops.pallas.int8_matmul import int8_matmul, supports
        if isinstance(w, LayerView):
            qa = w.qa
            if isinstance(qa, QuantizedArray) \
                    and supports(x, qa.q, qa.scale):
                return int8_matmul(x, qa.q, qa.scale, idx=w.idx)
        elif supports(x, w.q, w.scale):
            return int8_matmul(x, w.q, w.scale)
    if _A8_ENABLED.get() and (isinstance(w, QuantizedArray) or (
            isinstance(w, LayerView) and isinstance(w.qa, QuantizedArray))):
        if isinstance(w, LayerView):
            q, s = w.qa.q[w.idx], w.qa.scale[w.idx]
        else:
            q, s = w.q, w.scale
        # only plain x @ W leaves with per-out-channel scales qualify
        # (per-row-scaled embedding tables never reach qdot)
        if q.ndim == 2 and s.ndim == 2 and s.shape[0] == 1 \
                and x.shape[-1] == q.shape[0]:
            return _a8_dot(x, q, s)
    return jnp.einsum("...i,io->...o", x, w.astype(x.dtype))
