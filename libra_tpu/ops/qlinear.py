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


@contextlib.contextmanager
def kernel_enabled(flag: bool):
    """Trace-time switch for the Pallas int8 path (see module docstring)."""
    token = _KERNEL_ENABLED.set(flag)
    try:
        yield
    finally:
        _KERNEL_ENABLED.reset(token)


def kernel_active() -> bool:
    """True when Pallas int8 kernels may be emitted in the current trace
    (enabled context + TPU backend)."""
    return _KERNEL_ENABLED.get() and jax.default_backend() == "tpu"


def qdot(x: jax.Array, w) -> jax.Array:
    """x @ w -> (..., F). w: plain (K, F) array, QuantizedArray with
    per-out-channel scales (scale (1, F)), or a LayerView of a stacked
    quantized weight."""
    from libra_tpu.quantization import LayerView, QuantizedArray

    if kernel_active() and isinstance(w, (QuantizedArray, LayerView)):
        from libra_tpu.ops.pallas.int8_matmul import int8_matmul, supports
        if isinstance(w, LayerView):
            qa = w.qa
            if supports(x, qa.q, qa.scale):
                return int8_matmul(x, qa.q, qa.scale, idx=w.idx)
        elif supports(x, w.q, w.scale):
            return int8_matmul(x, w.q, w.scale)
    return jnp.einsum("...i,io->...o", x, w.astype(x.dtype))
