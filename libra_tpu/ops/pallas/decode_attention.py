"""Fused bridged decode attention over the head-major int8 KV cache.

One decode step's attention (Nq=1; q blocks up to Nq=8 for spec-decode
verify passes) reads the whole cached K/V history;
with an int8 cache the XLA path costs three passes over the data per layer
(dequant-materialise bf16, score reads, value reads -- profiled ~11 ms/step
on the full-32-layer 11B decode). This kernel reads the RAW int8 buffers
once, dequantises in VMEM, and runs scores + softmax + value sums on the
MXU, per (batch, head-block) grid cell:

    s    = (q . k_int) * k_scale * rsqrt(d)            # (1, S) fp32
    s   += cross ? (q . kb_int) * kb_scale * rsqrt(d)  # bridge keys
    a    = softmax(s + bias)                           # fp32, BIG_NEG clamp
    out  = (a * v_scale) . v_int + (a * cross * vb_scale) . vb_int

Scale folding is exact: K scales are per (token, head) constants along the
contraction, so (q.k_int)*s == q.(k_int*s); V scales fold into the
attention row. Semantics match ops/attention.bridged_attention (the
cross-modality-mask reformulation of modeling_libra.py:267-296,317-327;
cache tuple semantics anchor: modeling_libra.py:363-397).

Layouts: k/v int8 HEAD-MAJOR (B, H, S, d) with (B, H, S) fp32 scales
(sequence-minor, see models.libra.init_cache). Head-major makes each grid
cell's (hb, S, d) block a CONTIGUOUS run of the cache row -- the r2
sequence-major layout gave the same kernel 1 KB strided DMAs and made it
6x SLOWER than the XLA dequant path (11.6 vs 76.4 tok/s full-32); this
layout is why the kernel is now the default for quantized caches.
S must be a multiple of 128 (callers round the cache length up; the extra
positions are masked via `bias`).

The per-cell head block adapts to S so the double-buffered VMEM working
set stays bounded (~4 MB of int8 blocks per cell).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG_NEG = -2.0 ** 30

# Escape hatch, captured ONCE at import (a trace-time os.environ read would
# silently disagree with the compiled-program caches keyed only on
# GenerationConfig -- ADVICE r2 finding 2). Default ON.
ENABLED = os.environ.get("LIBRA_DECODE_ATTN_KERNEL", "1") != "0"

# Test hook: run the kernel in Pallas interpret mode on non-TPU backends so
# the model's kernel wiring is exercised by the CPU suite (tests patch this
# module attribute; production leaves it False).
INTERPRET = False


def decode_kernel_active() -> bool:
    """Backend gate: TPU (compiled) or the interpret-mode test hook.
    Composes with ops.qlinear's context gate (off under a TP mesh --
    pallas_call is opaque to GSPMD)."""
    from libra_tpu.ops.qlinear import _KERNEL_ENABLED
    if not _KERNEL_ENABLED.get():
        return False
    return jax.default_backend() == "tpu" or INTERPRET

# VMEM budget for one grid cell's int8 KV blocks (double-buffered by the
# pipeline; q/out/scales/bias are comparatively tiny).
_CELL_BYTES = 4 * 1024 * 1024


def _head_block(H: int, S: int, d: int, n_buf: int) -> int:
    for hb in (8, 4, 2, 1):
        if H % hb == 0 and n_buf * hb * S * d <= _CELL_BYTES:
            return hb
    return 1


def _cell_vmem_bytes(H: int, S: int, d: int, n_buf: int, N: int = 1) -> int:
    """Worst-case VMEM for one grid cell: the int8 KV blocks plus the FULL
    (H, S) fp32 scale planes (unblocked by design, see the scale-block note
    below), everything double-buffered by the pipeline -- PLUS the
    N-dependent blocks (ADVICE r4 item 2: merged chunked-prefill windows
    run N up to 64, where the q/out/bias blocks and the per-head (N, S)
    fp32 score+softmax temps are up to 64x the single-step sizes)."""
    hb = _head_block(H, S, d, n_buf)
    blocks = n_buf * hb * S * d          # int8 bytes
    scales = n_buf * H * S * 4           # fp32 planes
    q_out = 2 * hb * N * d * 2           # q + out blocks, bf16
    bias = N * S * 4                     # fp32 bias block
    score = 2 * N * S * 4                # (N, S) fp32 scores + softmax temp
    return 2 * (blocks + scales + q_out + bias) + score


# Keep a cell comfortably inside the ~16 MB of VMEM (q/out/bias/flags and
# compiler scratch ride on top). Flagship (H=32, d=128, bridged) passes up
# to S=4096 -- beyond the reference's 2048 cap; longer caches fall back to
# the XLA dequant path instead of a Mosaic VMEM failure at compile time.
_MAX_CELL_VMEM = 12 * 1024 * 1024


def _scores(q_h, k_ref, srow, h, inv_sqrt_d):
    k = k_ref[h].astype(jnp.bfloat16)                   # (S, d) contiguous
    s = jax.lax.dot_general(q_h, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (N, S)
    return s * srow * inv_sqrt_d


def _weighted_v(a, v_ref, srow, h):
    av = (a * srow).astype(jnp.bfloat16)                # (N, S)
    return jax.lax.dot_general(av, v_ref[h].astype(jnp.bfloat16),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (N, d)


# NOTE on scale blocks: the scale refs are the FULL (H, S) planes of the
# sequence-minor (B, H, S) scale buffers, indexed inside the kernel at the
# GLOBAL head (grid head-block offset + h). A per-head-block spec would
# need a (hb, 1, S)-shaped reshape of the buffers -- a (8,128)->(1,128)
# retiling that XLA materialised as a 12.6 MB copy of every scale buffer
# per LAYER per decode step (profiled 2.8 ms/step, r3).


def _kernel_bridge(q_ref, kq_ref, ks_ref, vq_ref, vs_ref,
                   kbq_ref, kbs_ref, vbq_ref, vbs_ref,
                   fq_ref, fkv_ref, bias_ref, o_ref, *, inv_sqrt_d):
    # fq_ref (1, N), fkv_ref (1, S), bias_ref (N, S): per-QUERY-row flags
    # and additive mask (q blocks of N > 1 carry in-block causality in the
    # bias -- the spec-decode verify pass)
    cross = fq_ref[0][:, None] != fkv_ref[:]            # (N, S)
    bias = bias_ref[:]                                  # (N, S)
    h0 = pl.program_id(1) * q_ref.shape[0]
    for h in range(q_ref.shape[0]):
        row = pl.ds(h0 + h, 1)
        q_h = q_ref[h]                                  # (N, d)
        s = _scores(q_h, kq_ref, ks_ref[row, :], h, inv_sqrt_d)
        sb = _scores(q_h, kbq_ref, kbs_ref[row, :], h, inv_sqrt_d)
        s = s + jnp.where(cross, sb, 0.0)
        s = jnp.maximum(s + bias, BIG_NEG)
        a = jax.nn.softmax(s, axis=-1)                  # fp32 (N, S)
        out = _weighted_v(a, vq_ref, vs_ref[row, :], h)
        out = out + _weighted_v(jnp.where(cross, a, 0.0),
                                vbq_ref, vbs_ref[row, :], h)
        o_ref[h] = out.astype(o_ref.dtype)


def _kernel_plain(q_ref, kq_ref, ks_ref, vq_ref, vs_ref,
                  bias_ref, o_ref, *, inv_sqrt_d):
    bias = bias_ref[:]                                  # (N, S)
    h0 = pl.program_id(1) * q_ref.shape[0]
    for h in range(q_ref.shape[0]):
        row = pl.ds(h0 + h, 1)
        q_h = q_ref[h]                                  # (N, d)
        s = _scores(q_h, kq_ref, ks_ref[row, :], h, inv_sqrt_d)
        s = jnp.maximum(s + bias, BIG_NEG)
        a = jax.nn.softmax(s, axis=-1)
        o_ref[h] = _weighted_v(a, vq_ref, vs_ref[row, :], h) \
            .astype(o_ref.dtype)


def _kernel_bridge_stacked(idx_ref, *refs, inv_sqrt_d):
    del idx_ref              # consumed by the index_maps (layer selection)
    _kernel_bridge(*refs, inv_sqrt_d=inv_sqrt_d)


def _kernel_plain_stacked(idx_ref, *refs, inv_sqrt_d):
    del idx_ref
    _kernel_plain(*refs, inv_sqrt_d=inv_sqrt_d)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_decode_attention(q, kq, ks, vq, vs, kbq=None, kbs=None,
                          vbq=None, vbs=None, flag_q=None, kv_flag=None,
                          bias=None, layer_idx=None,
                          interpret: bool = False):
    """q (B, N, H, d) bf16, N <= 8; kq/vq HEAD-MAJOR (B, H, S, d) int8
    with (B, H, S) fp32 scales; optional bridge tensors; flag_q (B,) or
    per-query (B, N) / kv_flag (B, S) bool; bias (B, S) or per-query
    (B, N, S) additive fp32 (q blocks carry their in-block causality in
    the bias). Returns (B, N, H, d) in q.dtype.

    With `layer_idx`, kq/vq (and bridges) are the FULL STACKED cache
    (L, B, H, S, d) with (L, B, H, S) scales: the layer index rides
    scalar prefetch and the index_maps DMA only that layer's tiles
    straight out of the stacked HBM buffers. This is the decode layer-scan
    path -- the cache stays a scan CARRY updated in place, and slicing a
    layer first would either copy 4x12.6 MB per layer per step (XLA
    dynamic-slice materialises) or, worse, force the r2 design's
    scan-xs/ys cache threading whose carry re-materialisation copied the
    FULL 4x400 MB cache every decode step (profiled ~5 ms/step)."""
    stacked = layer_idx is not None
    B, N, H, d = q.shape
    S = kq.shape[-2]
    kv_shape = (B, H, S, d) if not stacked else kq.shape[:1] + (B, H, S, d)
    # N <= 8: single-step decode / spec-decode verify blocks. Larger N
    # (multiples of 8 up to 64): merged chunked-prefill windows (serving) --
    # the (N, S) fp32 score block stays ~192 KB at S=768, well inside VMEM.
    assert (N <= 8 or (N <= 64 and N % 8 == 0)) and S % 128 == 0 \
        and kq.shape == kv_shape, (q.shape, kq.shape)
    use_bridge = kbq is not None
    hb = _head_block(H, S, d, 4 if use_bridge else 2)
    qh = q.transpose(0, 2, 1, 3)                        # (B, H, N, d)
    # bias (B, S) [single-step] or (B, N, S) [q-block with in-block
    # causality, the spec-decode verify pass]
    bias = bias.astype(jnp.float32)
    if bias.ndim == 2:
        bias = bias[:, None, :]
    bias = jnp.broadcast_to(bias, (B, N, S))
    grid = (B, H // hb)

    if stacked:
        q_spec = pl.BlockSpec((None, hb, N, d), lambda b, h, iref: (b, h, 0, 0))
        kv_spec = pl.BlockSpec((None, None, hb, S, d),
                               lambda b, h, iref: (iref[0], b, h, 0, 0))
        s_spec = pl.BlockSpec((None, None, H, S),
                              lambda b, h, iref: (iref[0], b, 0, 0))
        row_spec = pl.BlockSpec((None, 1, S), lambda b, h, iref: (b, 0, 0))
        bias_spec = pl.BlockSpec((None, N, S), lambda b, h, iref: (b, 0, 0))
        fq_spec = pl.BlockSpec((None, 1, N), lambda b, h, iref: (b, 0, 0))
        out_spec = pl.BlockSpec((None, hb, N, d),
                                lambda b, h, iref: (b, h, 0, 0))
    else:
        q_spec = pl.BlockSpec((None, hb, N, d), lambda b, h: (b, h, 0, 0))
        kv_spec = pl.BlockSpec((None, hb, S, d), lambda b, h: (b, h, 0, 0))
        s_spec = pl.BlockSpec((None, H, S), lambda b, h: (b, 0, 0))
        row_spec = pl.BlockSpec((None, 1, S), lambda b, h: (b, 0, 0))
        bias_spec = pl.BlockSpec((None, N, S), lambda b, h: (b, 0, 0))
        fq_spec = pl.BlockSpec((None, 1, N), lambda b, h: (b, 0, 0))
        out_spec = pl.BlockSpec((None, hb, N, d), lambda b, h: (b, h, 0, 0))
    out_shape = jax.ShapeDtypeStruct((B, H, N, d), q.dtype)

    def sc(s):
        # scales pass through UNRESHAPED (sequence-minor (.., B, H, S));
        # the kernel indexes the (H, S) plane at the global head
        assert s.dtype == jnp.float32, s.dtype
        return s

    if use_bridge:
        fq = flag_q.astype(jnp.int32)
        if fq.ndim == 1:
            fq = fq[:, None]
        fq = jnp.broadcast_to(fq, (B, N)).reshape(B, 1, N)
        fkv = kv_flag.astype(jnp.int32).reshape(B, 1, S)
        kern = _kernel_bridge_stacked if stacked else _kernel_bridge
        in_specs = [q_spec, kv_spec, s_spec, kv_spec, s_spec,
                    kv_spec, s_spec, kv_spec, s_spec,
                    fq_spec, row_spec, bias_spec]
        args = (qh.astype(jnp.bfloat16), kq, sc(ks), vq, sc(vs),
                kbq, sc(kbs), vbq, sc(vbs), fq, fkv, bias)
    else:
        kern = _kernel_plain_stacked if stacked else _kernel_plain
        in_specs = [q_spec, kv_spec, s_spec, kv_spec, s_spec, bias_spec]
        args = (qh.astype(jnp.bfloat16), kq, sc(ks), vq, sc(vs), bias)

    kern = functools.partial(kern, inv_sqrt_d=1.0 / d ** 0.5)
    if stacked:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=in_specs, out_specs=out_spec)
        out = pl.pallas_call(kern, grid_spec=grid_spec, out_shape=out_shape,
                             interpret=interpret)(
            jnp.asarray(layer_idx, jnp.int32).reshape(1), *args)
    else:
        out = pl.pallas_call(kern, grid=grid, in_specs=in_specs,
                             out_specs=out_spec, out_shape=out_shape,
                             interpret=interpret)(*args)
    return out.transpose(0, 2, 1, 3)                    # (B, N, H, d)


def decode_kernel_applicable(cfg, cache_k, q_len: int) -> bool:
    """Static gate: the fused kernel handles this decode step's shapes.
    cache_k may be a per-layer (B, H, S, d) or stacked (L, B, H, S, d)
    QuantizedArray. q blocks up to 8 (spec-decode verify passes) and
    8-multiples up to 64 (merged chunked-prefill windows, serving) are
    supported; prompt-scale q lengths fall back to the prefill paths.
    (Backend/TP gating is the caller's via decode_kernel_active.)"""
    from libra_tpu.quantization import QuantizedArray
    if not ENABLED:
        return False
    if not (1 <= q_len <= 8 or (q_len <= 64 and q_len % 8 == 0)):
        return False
    if not isinstance(cache_k, QuantizedArray):
        return False
    H, S, d = cache_k.q.shape[-3:]
    n_buf = 4 if cfg.use_bridge else 2
    return (S % 128 == 0 and cfg.head_dim % 128 == 0
            and _cell_vmem_bytes(H, S, d, n_buf, N=q_len)
            <= _MAX_CELL_VMEM)
