"""Weight-only int8 quantization for serving.

Symmetric per-channel int8 with a float scale, applied leaf-wise over a
param pytree. Dequantization happens inside the compiled program at the
weight's consumption site (every weight in libra_tpu is consumed through
`.astype(compute_dtype)` or an embedding gather `w[ids].astype(...)`, both
of which `QuantizedArray` implements), so XLA fuses int8->bf16 conversion
into the matmul read and HBM weight traffic halves.

Why this exists (net-new vs the reference, which serves pure bf16/fp16):
the 11B flagship is ~18 GB in bf16 -- larger than one v5e's 16 GB HBM --
but ~9.4 GB in int8: **the full 32-layer model single-chip decodes** at the
int8 bandwidth roofline instead of requiring a multi-chip TP mesh.
Measured on one v5e: a (4096, 11008) matvec runs 0.187 ms int8 vs 0.244 ms
bf16 (1.3x).

Inference-only: quantized trees are not differentiable (round/clip);
training keeps bf16/fp32 params.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_with_keys_class
class QuantizedArray:
    """int8 weight + broadcastable float scale, duck-typing the two ways
    model code consumes weights: `.astype(dt)` and `w[idx]` gathers."""

    def __init__(self, q, scale):
        self.q = q
        self.scale = scale

    def tree_flatten_with_keys(self):
        K = jax.tree_util.GetAttrKey
        return ((K("q"), self.q), (K("scale"), self.scale)), None

    def tree_flatten(self):
        return (self.q, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.q.shape

    @property
    def ndim(self) -> int:
        return self.q.ndim

    @property
    def dtype(self):
        return self.scale.dtype

    def astype(self, dt):
        return self.q.astype(dt) * self.scale.astype(dt)

    def __getitem__(self, idx):
        # embedding-style row gather: the same index applies to the scale
        # (per-row scales have shape (..., V, 1))
        return QuantizedArray(self.q[idx], self.scale[idx])

    def __repr__(self):
        return f"QuantizedArray(q={self.q.shape}, scale={self.scale.shape})"


@jax.tree_util.register_pytree_with_keys_class
class Quantized4Array:
    """Group-quantized int4 weight: signed-byte packed nibbles (see
    ops/pallas/int4_matmul) + per-(group, out-channel) float scales.
    packed (..., K/2, O) int8, scale (..., K/group, O) f32. Duck-types
    `.astype(dt)` like QuantizedArray; consumed by qdot through the
    fused int4 Pallas kernel on TPU, dequant-einsum elsewhere.

    out_features: TRUE output width when the stored O is zero-padded up
    to the kernel's preferred block size (r5: bo=1024 grid steps measured
    448 vs 395 GB/s effective at bo=256 on the gate/up shape; 11008 pads
    to 11264). Consumers (.astype, qdot) slice the padding back off.
    a8: execute as W4A8 (per-row dynamic int8 activations, s8 x s8 MXU
    dots) -- measured faster than the bf16-dot weight-only form at decode
    M, at the standard ~0.7% activation-quantization error."""

    def __init__(self, packed, scale, group: int = 128,
                 out_features: Optional[int] = None, a8: bool = False):
        self.packed = packed
        self.scale = scale
        self.group = group
        self.out_features = out_features
        self.a8 = a8

    def tree_flatten_with_keys(self):
        K = jax.tree_util.GetAttrKey
        return ((K("packed"), self.packed), (K("scale"), self.scale)), \
            (self.group, self.out_features, self.a8)

    def tree_flatten(self):
        return (self.packed, self.scale), \
            (self.group, self.out_features, self.a8)

    @classmethod
    def tree_unflatten(cls, aux, children):
        aux = aux if isinstance(aux, tuple) else (aux,)
        return cls(*children, *aux)

    @property
    def shape(self) -> Tuple[int, ...]:
        s = self.packed.shape
        o = self.out_features if self.out_features is not None else s[-1]
        return s[:-2] + (2 * s[-2], o)

    @property
    def ndim(self) -> int:
        return self.packed.ndim

    @property
    def dtype(self):
        return self.scale.dtype

    def astype(self, dt):
        from libra_tpu.ops.pallas.int4_matmul import dequant_int4
        w = dequant_int4(self.packed, self.scale, self.group, dt)
        if self.out_features is not None \
                and self.out_features != w.shape[-1]:
            w = w[..., :self.out_features]
        return w

    def __getitem__(self, idx):
        return Quantized4Array(self.packed[idx], self.scale[idx], self.group,
                               self.out_features, self.a8)

    def __repr__(self):
        return (f"Quantized4Array(packed={self.packed.shape}, "
                f"scale={self.scale.shape}, group={self.group}, "
                f"out_features={self.out_features}, a8={self.a8})")


class LayerView:
    """Zero-copy view of layer `idx` of a STACKED (L, ...) quantized
    array (QuantizedArray or Quantized4Array).

    Built inside the layer scan body instead of slicing: a sliced int8
    weight feeding an (XLA-opaque) pallas_call would materialise a copy of
    the layer's bytes every decode step. The view carries the full stacked
    buffers plus the traced layer index; the Pallas kernel DMAs only that
    layer's tiles (scalar-prefetch index_map), and the XLA fallback path
    (.astype) lets the dequant-slice fuse into the consuming matmul as
    before.
    """

    def __init__(self, qa, idx):
        self.qa = qa
        self.idx = idx

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.qa.shape[1:]

    @property
    def ndim(self) -> int:
        return self.qa.ndim - 1

    @property
    def dtype(self):
        return self.qa.dtype

    def astype(self, dt):
        return self.qa[self.idx].astype(dt)


def quantize_array(w, axis: int) -> QuantizedArray:
    """Symmetric per-channel int8: scale = amax/127 over `axis`.

    numpy inputs stay on the host (an 11B checkpoint must not round-trip
    the device to quantize); jax inputs use jnp (traceable under jit)."""
    if isinstance(w, np.ndarray):
        a = np.max(np.abs(w), axis=axis, keepdims=True)
        scale = (np.where(a > 0, a, 1.0).astype(np.float32) / 127.0)
        q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        return QuantizedArray(q, scale)
    a = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scale = jnp.where(a > 0, a, 1.0).astype(jnp.float32) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QuantizedArray(q, scale)


# Leaves consumed as row gathers (embeddings): scale per row (reduce the
# feature axis). Everything else is consumed as x @ W: scale per output
# channel (reduce the contracting axis, -2).
_PER_ROW = ("embed_tokens", "vision_embed_tokens")

# Leaves that stay in their original dtype: vision_lm_head (Q, D, Vv) is
# consumed per-codebook through an einsum; int8 storage made XLA pick a
# codebook-minor layout whose per-codebook slices ran at ~3 GB/s
# (profiled 2.5 ms/decode-step, r3) while the bf16 head costs ~12 us of
# clean streaming. It is ~8 MB -- int8 saved nothing that mattered.
_NEVER_QUANT = ("vision_lm_head",)


def _leaf_axis(name: str, leaf) -> Optional[int]:
    if not jnp.issubdtype(leaf.dtype, jnp.floating):
        return None
    if leaf.ndim < 2 or name in _NEVER_QUANT:
        return None
    # stacked per-layer norm gains are (L, D): matrices by shape but 1-D
    # vectors semantically -- quantizing them breaks the layer scan (their
    # scale would not carry the layer axis) and saves nothing
    if "norm" in name:
        return None
    return -1 if name in _PER_ROW else -2


def _is_low_rank_pair(x) -> bool:
    return isinstance(x, dict) and set(x.keys()) == {"wa", "wb"}


def _pad_axis(w, axis: int, pad: int):
    widths = [(0, 0)] * w.ndim
    widths[axis % w.ndim] = (0, pad)
    if isinstance(w, np.ndarray):
        return np.pad(w, widths)
    return jnp.pad(w, widths)


def _int4_pad_o(K: int, O: int) -> int:
    """Zero-padding that lifts O to the int4 kernel's PREFERRED block
    size (the unconstrained 2 MB tile width for this K), capped at 1/16
    relative overhead. Measured r5 on (4096, 11008): bo=1024 grid steps
    run 448 GB/s effective vs 395 at the bo=256 fallback the unpadded
    11008 forces -- fewer grid steps amortize per-block pipeline
    overheads."""
    from libra_tpu.ops.pallas.int4_matmul import _TILE_BYTES
    bo = max(128, (_TILE_BYTES // (K // 2) // 128) * 128)
    pad = -O % bo
    return pad if pad * 16 <= O else 0


def quantize_array_int4(w, group: int = 128,
                        a8: bool = True) -> Quantized4Array:
    """Symmetric group-int4 for x @ W leaves (contracting axis -2):
    scale = group-amax/7 per (group, out-channel). Host numpy stays on
    the host, like quantize_array. O is zero-padded to the kernel's
    preferred block size (exact: padded columns are sliced back off at
    every consumption site via out_features)."""
    from libra_tpu.ops.pallas.int4_matmul import pack_int4
    K, O = w.shape[-2], w.shape[-1]
    pad = _int4_pad_o(K, O)
    if pad:
        w = _pad_axis(w, -1, pad)
    packed, scale = pack_int4(w, group=group)
    return Quantized4Array(packed, scale, group,
                           out_features=O if pad else None, a8=a8)


def _int4_ok(leaf, axis: int, group: int) -> bool:
    """int4 only helps leaves the fused kernel can stream: x @ W shapes
    (axis -2) with K % max(2*group, 256) == 0 and O % 128 == 0 (stacked
    or plain). Everything else stays int8."""
    if axis != -2:
        return False                     # per-row embedding gathers
    K, O = leaf.shape[-2], leaf.shape[-1]
    return (K % group == 0 and K % (2 * group) == 0 and (K // 2) % 128 == 0
            and O % 128 == 0)


def quantize_params(params: Any, min_elems: int = 1 << 16,
                    bits: int = 8, group: int = 128) -> Any:
    """Quantize every float matrix leaf with >= min_elems elements.

    bits=4 (serving opt-in): x @ W projection leaves that the fused int4
    kernel can stream become Quantized4Array (group-int4, half the int8
    bytes -- decode is weight-bandwidth-bound, so bytes are tokens/s);
    embeddings and kernel-incompatible shapes stay int8. bits=8 is the
    default weight-only int8 mode.

    Norm gains, small placeholders etc. stay in their original dtype
    (quantizing them saves nothing and costs accuracy). Stacked layer
    weights (L, in, out) get per-(layer, out) scales, so `lax.scan`
    slicing one layer also slices its scales.

    Low-rank {wa, wb} pairs are handled as a UNIT (VERDICT r3 item 2):

    * an MXU-unaligned bottleneck (e.g. the flagship's 11008/4 = 2752
      vision-MLP inner dim) is zero-padded up to a multiple of 128 ONCE
      here -- wa gains zero output columns, wb gains matching zero input
      rows, which is exact -- so both members stream through the fused
      Pallas int8 kernel instead of the ~0.5x-bandwidth XLA dequant einsum.
      (Load-time padding has no per-step cost; the in-kernel variant was
      reverted in r2 because XLA re-padded 2.7 GB per decode step.)
    * tiny-bottleneck pairs (rank-8 bridges) stay UNQUANTIZED: int8 would
      save ~nothing but force the slow XLA dequant path on every step.
    """
    def visit_leaf(name, leaf):
        if getattr(leaf, "size", 0) < min_elems:
            return leaf
        axis = _leaf_axis(name, leaf)
        if axis is None:
            return leaf
        if bits == 4 and _int4_ok(leaf, axis, group):
            return quantize_array_int4(leaf, group)
        return quantize_array(leaf, axis)

    def visit(path, node):
        if _is_low_rank_pair(node):
            wa, wb = node["wa"], node["wb"]
            inner = wa.shape[-1]
            assert wb.shape[-2] == inner, (wa.shape, wb.shape)
            if max(getattr(wa, "size", 0), getattr(wb, "size", 0)) \
                    < min_elems:
                return node
            if inner < 128:
                return node                      # bridges: keep bf16/f32
            # int4 needs K % 2*group; pad the bottleneck up accordingly
            pad = -inner % (2 * group if bits == 4 else 128)
            if pad:
                wa = _pad_axis(wa, -1, pad)
                wb = _pad_axis(wb, -2, pad)
            return {"wa": visit_leaf("wa", wa), "wb": visit_leaf("wb", wb)}
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        return visit_leaf(keys[-1] if keys else "", node)

    return jax.tree_util.tree_map_with_path(visit, params,
                                            is_leaf=_is_low_rank_pair)


_QTYPES = (QuantizedArray, Quantized4Array)


def dequantize_params(params: Any, dtype=jnp.float32) -> Any:
    """Materialise a plain pytree (for checkpoint export / debugging)."""
    def visit(leaf):
        if isinstance(leaf, _QTYPES):
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map(
        visit, params, is_leaf=lambda x: isinstance(x, _QTYPES))


def quantization_error(params: Any, quantized: Any) -> float:
    """Max relative per-tensor dequantization error (diagnostics)."""
    orig = jax.tree_util.tree_leaves(params)
    quant = jax.tree_util.tree_leaves(
        quantized, is_leaf=lambda x: isinstance(x, _QTYPES))
    errs = []
    for o, q in zip(orig, quant):
        if isinstance(q, _QTYPES):
            w = jnp.asarray(o, jnp.float32)
            d = q.astype(jnp.float32)
            errs.append(float(jnp.max(jnp.abs(w - d))
                              / (jnp.max(jnp.abs(w)) + 1e-9)))
    return max(errs) if errs else 0.0
