"""Parameter and activation sharding rules (GSPMD PartitionSpecs).

Megatron-style tensor parallelism over the "model" axis:
  * column-parallel: q/k/v, gate/up, vision low-rank B-factors feeding
    head-sharded activations;
  * row-parallel: o_proj, down_proj, vision low-rank A-factors consuming
    head-/intermediate-sharded activations (XLA inserts the psum);
FSDP-style weight sharding over the "fsdp" axis on a non-contracting dim
(the reference's ZeRO-2/3: DeepSpeed configs, SURVEY.md section 2.5).

All rules are name-based over the pytree paths of
libra_tpu.models.libra.init_params; stacked layer params get a leading
None for the layer axis.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from libra_tpu.config import LibraConfig


def _spec_for(path: str, ndim: int, layered: bool) -> P:
    """PartitionSpec for a parameter identified by its '/'-joined path."""
    d, f, m = "data", "fsdp", "model"

    def out(*axes):
        axes = list(axes)
        assert len(axes) == (ndim - 1 if layered else ndim), path
        if layered:
            axes = [None] + axes
        return P(*axes)

    name = path.split("/")[-1]
    parent = path.split("/")[-2] if "/" in path else ""

    # --- attention / MLP full-rank projections ---
    if name in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
        return out(f, m)            # column-parallel
    if name in ("o_proj", "down_proj"):
        return out(m, f)            # row-parallel

    # --- low-rank vision twins and bridges ---
    if name == "wa":
        if parent in ("vision_o",):
            return out(m, f)        # consumes head-sharded activations
        if parent in ("vision_down",):
            return out(m, f)        # consumes intermediate-sharded acts
        if parent.startswith(("k_bridge", "v_bridge")):
            return out(f, None)     # rank-8: replicate bottleneck
        return out(f, None)         # vision_q/k/v/gate/up
    if name == "wb":
        if parent in ("vision_o", "vision_down"):
            return out(None, f)
        if parent.startswith(("k_bridge", "v_bridge")):
            return out(None, m)     # head-sharded outputs (rank-8: tiny)
        # vision_q/k/v/gate/up: bottleneck over fsdp, outputs head-/
        # intermediate-sharded over model. The fsdp dim matters for ZeRO:
        # these are the TRAINABLE weights under frozen_language, and on an
        # fsdp-dominant mesh (model=1) a model-only spec leaves the weight
        # AND its two Adam moments fully replicated (r4: measured 4.3 GB
        # of the 8-chip pretrain step's per-chip argument bytes).
        return out(f, m)

    # --- embeddings / heads ---
    if name == "embed_tokens":
        # vocab-sharded (not feature-sharded): the feature axis must stay
        # whole because the h-cotangent leaves the backward layer scan
        # feature-MODEL-sharded (lm_head's reduce-scatter) while a
        # feature-fsdp grad scatter would need a transposed-order all-to-all
        # -- GSPMD falls back to full rematerialisation ("involuntary full
        # rematerialization" warnings, VERDICT r1 item 8). Vocab-sharding
        # keeps the same ZeRO memory split with a clean scatter path.
        return out(f, None)
    if name == "vision_embed_tokens":
        return out(None, None, None)
    if name == "lm_head":
        return out(f, m)            # vocab-parallel output
    if name == "vision_lm_head":
        return out(None, f, None)
    if name == "signal_proj":
        return out(f, None)
    if name == "vision_position_embedding":
        return out(None, None)

    # norms, placeholders, scalars: replicate
    return out(*([None] * (ndim - 1 if layered else ndim)))


def _path_keys(path) -> list:
    out = []
    for p in path:
        k = getattr(p, "key", None)
        if k is None:
            k = getattr(p, "name", None)
        out.append(str(k) if k is not None else str(p))
    return out


def param_specs(params: Any) -> Any:
    """Pytree of PartitionSpec matching a libra param pytree.

    Understands weight-only-quantized trees (libra_tpu.quantization): a
    QuantizedArray's `q` gets the spec of the plain weight it replaced;
    its `scale` gets the same spec with every size-1 (reduced) dim
    unsharded, so dequantization never introduces a collective."""
    def visit(path, leaf):
        keys = _path_keys(path)
        layered = "layers" in keys
        if keys and keys[-1] in ("q", "packed", "scale"):
            base = _spec_for("/".join(keys[:-1]), leaf.ndim, layered)
            if keys[-1] in ("q", "packed"):
                return base
            axes = [None if leaf.shape[d] == 1 else base[d]
                    for d in range(leaf.ndim)]
            return P(*axes)
        return _spec_for("/".join(keys), leaf.ndim, layered)
    return jax.tree_util.tree_map_with_path(visit, params)


def param_shardings(mesh: Mesh, params: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), param_specs(params))


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place a (host or replicated) param pytree onto the mesh."""
    return jax.device_put(params, param_shardings(mesh, params))


def state_specs(params: Any, state: Any) -> Any:
    """PartitionSpecs for a TrainState / optax optimizer-state pytree.

    Any state leaf whose path SUFFIX matches a parameter path (and rank)
    inherits that parameter's spec -- Adam mu/nu mirror the param tree
    under `.../mu/<param path>` -- so optimizer moments shard exactly like
    their weights (the ZeRO contract, SURVEY.md section 2.5). Everything
    else (schedule counts, step, clip state) replicates.

    This must be EXPLICIT rather than left to GSPMD propagation: opt.init
    builds moments with `jnp.zeros_like(p)`, which lowers to a constant
    broadcast with NO data dependence on the param, so sharding
    propagation has nothing to walk and XLA leaves the moments fully
    replicated (r4: measured ~10 GB/chip of replicated f32 moments on the
    8-chip pretrain compile before this existed)."""
    ptab = {}
    for p, spec in jax.tree_util.tree_flatten_with_path(
            param_specs(params))[0]:
        ptab[tuple(_path_keys(p))] = spec

    def visit(path, leaf):
        keys = tuple(_path_keys(path))
        for i in range(len(keys)):
            spec = ptab.get(keys[i:])
            if spec is not None and len(spec) == leaf.ndim:
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(visit, state)


def state_shardings(mesh: Mesh, params: Any, state: Any) -> Any:
    """NamedShardings for a TrainState-shaped pytree (see state_specs).
    `state` may be concrete arrays or jax.eval_shape structs."""
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), state_specs(params, state))


def cache_shardings(mesh: Mesh, cfg: LibraConfig, quantized: bool = False):
    """NamedShardings for the decode KVCache (k/v/kb/vb: bf16
    (L, B, S, H, head_dim); int8 head-major (L, B, H, S, head_dim)):
    attention heads shard over the "model" axis --
    the decode-time KV cache lives sharded over ICI (the serving north
    star), batch over "data". flag/index replicate (tiny). quantized=True
    mirrors the int8 cache structure (q + per-(token, head) scale)."""
    from libra_tpu.models.libra import KVCache
    from libra_tpu.quantization import QuantizedArray

    spec = P(None, "data", None, "model", None)
    kv = NamedSharding(mesh, spec)
    if quantized:
        # int8 buffers are HEAD-MAJOR (L, B, H, S, d) with (L, B, H, S)
        # scales -- heads over "model" in both
        kv = QuantizedArray(
            NamedSharding(mesh, P(None, "data", "model", None, None)),
            NamedSharding(mesh, P(None, "data", "model", None)))
    return KVCache(
        k=kv, v=kv,
        kb=kv if cfg.use_bridge else None,
        vb=kv if cfg.use_bridge else None,
        flag=NamedSharding(mesh, P("data", None)),
        index=NamedSharding(mesh, P()),
    )


def batch_spec() -> P:
    """Batch dims shard over (data, fsdp) combined -- FSDP groups behave as
    extra data parallelism, like ZeRO."""
    return P(("data", "fsdp"))


# Batch arrays keyed by name: input_ids/labels are codebook-major (Q, B, N),
# everything else is batch-major.
_CODEBOOK_MAJOR = {"input_ids", "labels"}


def data_shardings(mesh: Mesh, batch: Dict[str, Any],
                   stacked: bool = False) -> Dict[str, Any]:
    """stacked=True: leaves carry a leading micro-accumulation axis (A, ...)
    which stays unsharded (every device scans all A micros of its local
    batch shard).

    On a mesh with a non-trivial "seq" axis the TOKEN axis N additionally
    shards over it (sequence/context parallelism): activations through the
    layer stack stay N-sharded and GSPMD all-gathers K/V for attention.
    Parameters never shard over "seq" (see mesh.py)."""
    lead = (None,) if stacked else ()
    sq = "seq" if "seq" in mesh.axis_names else None
    out = {}
    for k, v in batch.items():
        if v is None:
            out[k] = None
        elif k in _CODEBOOK_MAJOR:    # (A?, Q, B, N)
            out[k] = NamedSharding(mesh, P(*lead, None, ("data", "fsdp"), sq))
        elif k == "coninous_signal":  # (A?, B, N, C)
            out[k] = NamedSharding(mesh, P(*lead, ("data", "fsdp"), sq, None))
        else:                         # (A?, B, N)
            out[k] = NamedSharding(mesh, P(*lead, ("data", "fsdp"), sq))
    return out
