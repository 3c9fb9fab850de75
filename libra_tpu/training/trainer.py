"""SPMD training: one jitted train step over a device mesh.

TPU-native replacement for the reference harness (trainer.py: HF Trainer +
DeepSpeed ZeRO over NCCL). Here:

* data parallelism = batch sharded over the (data, fsdp) axes; XLA psums
  gradients over ICI/DCN (the reference's NCCL all-reduce);
* ZeRO-2/3 = parameters AND optimizer state sharded with the same
  PartitionSpecs over the fsdp axis (sharded pytrees, no gather/scatter
  machinery);
* gradient checkpointing = jax.checkpoint on the scanned layer body
  (the reference monkey-patches torch.utils.checkpoint;
  utils/reset_gradient_checkpointing.py);
* bf16 compute with fp32 params and fp32 loss.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from libra_tpu.config import LibraConfig
from libra_tpu.models import libra as M
from libra_tpu.parallel.sharding import (data_shardings, param_shardings,
                                         state_shardings)
from libra_tpu.training.optimizer import OptimizerConfig, make_optimizer


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def init_state(params: Any, opt: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=opt.init(params),
                      step=jnp.zeros((), jnp.int32))


def loss_fn(params: Any, cfg: LibraConfig, batch: Dict[str, Any],
            remat=True,
            dropout_rng: Optional[jax.Array] = None) -> jax.Array:
    """Per-codebook shifted CE averaged over codebooks
    (reference: modeling_libra.py:1159-1174).

    batch: input_ids (Q,B,N), attention_mask (B,N), vision_indices (B,N),
           coninous_signal (B,N,C) or None, labels (Q,B,N) with -100."""
    out = M.forward(params, cfg, batch["input_ids"], batch["attention_mask"],
                    batch["vision_indices"], batch.get("coninous_signal"),
                    remat=remat, dropout_rng=dropout_rng)
    flag = batch["vision_indices"] < cfg.max_vision_token_length
    tl = M.compute_text_logits(params, out.hidden_states)
    if cfg.vision_prediction_mode == "2d":
        vl = M.compute_vision_logits_2d(params, cfg, out.hidden_states,
                                        batch["vision_indices"])
    else:
        vl = M.compute_vision_logits(params, out.hidden_states)
    return M.multicodebook_loss(cfg, tl, vl, flag, batch["labels"],
                                unified=cfg.unified_head)


def masked_value_and_grad(loss_of_params, params, grad_mask):
    """value_and_grad over ONLY the grad_mask-True leaves.

    The r2 design differentiated the FULL tree and let the optimizer's
    set_to_zero partition discard frozen gradients -- which still EMITTED
    every frozen dL/dW matmul (a third of the backward FLOPs under
    frozen_language) and carried a full-tree gradient buffer. Here the
    frozen leaves enter the loss as closed-over constants, so their
    weight-gradient matmuls are never built; the returned tree has
    jnp.zeros_like leaves for frozen params (folded by XLA -- the optax
    partition API still sees a full tree).

    grad_mask=None keeps the plain full-tree behaviour."""
    if grad_mask is None:
        return jax.value_and_grad(loss_of_params)(params)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    m = jax.tree_util.tree_leaves(grad_mask)
    tp = [p for p, mm in zip(leaves, m) if mm]

    def loss_t(tp_):
        it = iter(tp_)
        full = jax.tree_util.tree_unflatten(
            treedef, [next(it) if mm else p for p, mm in zip(leaves, m)])
        return loss_of_params(full)

    loss, gt = jax.value_and_grad(loss_t)(tp)
    it = iter(gt)
    grads = jax.tree_util.tree_unflatten(
        treedef, [next(it) if mm else jnp.zeros_like(p)
                  for p, mm in zip(leaves, m)])
    return loss, grads


def _finish_step(state: TrainState, loss, grads, trainable_grads, *,
                 opt: optax.GradientTransformation, grad_mask: Any
                 ) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """Optimizer update + masked apply shared by both step flavours.

    The frozen leaves of `grads` are zeros_like placeholders (the optax
    multi_transform partition API wants a full tree). They must stay DEAD
    CODE: grad_norm runs on `trainable_grads` (the trainable-only list)
    and apply skips frozen leaves entirely, so the only consumer of the
    placeholder zeros is set_to_zero (whose output is unused) and XLA
    DCEs the broadcasts (r4: they previously materialised as ~4 GB of
    zero-filled temps per chip on the frozen_language pretrain step)."""
    updates, new_opt = opt.update(grads, state.opt_state, state.params)
    if grad_mask is None:
        new_params = optax.apply_updates(state.params, updates)
    else:
        new_params = jax.tree_util.tree_map(
            lambda p, u, mm: optax.apply_updates(p, u) if mm else p,
            state.params, updates, grad_mask)
    metrics = {
        "loss": loss,
        "grad_norm": optax.global_norm(trainable_grads),
        "step": state.step,
    }
    return TrainState(new_params, new_opt, state.step + 1), metrics


def train_step(state: TrainState, batch: Dict[str, Any], *,
               cfg: LibraConfig, opt: optax.GradientTransformation,
               dropout_seed: int = 0, grad_mask: Any = None, remat=True
               ) -> Tuple[TrainState, Dict[str, jax.Array]]:
    # per-step dropout rng (only materialised when any pdrop > 0): the
    # step counter keys the fold so resume reproduces the same masks
    rng = (jax.random.fold_in(jax.random.PRNGKey(dropout_seed), state.step)
           if M.dropout_enabled(cfg) else None)
    loss, grads = masked_value_and_grad(
        lambda p: loss_fn(p, cfg, batch, remat=remat, dropout_rng=rng),
        state.params, grad_mask)
    if grad_mask is None:
        tg = grads
    else:
        tg = [g for g, mm in zip(jax.tree_util.tree_leaves(grads),
                                 jax.tree_util.tree_leaves(grad_mask)) if mm]
    return _finish_step(state, loss, grads, tg, opt=opt,
                        grad_mask=grad_mask)


def eval_step(state: TrainState, batch: Dict[str, Any], *,
              cfg: LibraConfig) -> jax.Array:
    return loss_fn(state.params, cfg, batch, remat=False)


def _group_loss_fn(params: Any, cfg: LibraConfig, batch: Dict[str, Any],
                   denom: jax.Array,
                   dropout_rng: Optional[jax.Array] = None,
                   remat=True) -> jax.Array:
    """Micro-batch loss normalised by the accumulation GROUP's per-codebook
    valid-label counts `denom` (Q,): summing this over the group's micros
    reproduces the concatenated-batch loss (and gradient) exactly."""
    out = M.forward(params, cfg, batch["input_ids"], batch["attention_mask"],
                    batch["vision_indices"], batch.get("coninous_signal"),
                    remat=remat, dropout_rng=dropout_rng)
    flag = batch["vision_indices"] < cfg.max_vision_token_length
    tl = M.compute_text_logits(params, out.hidden_states)
    if cfg.vision_prediction_mode == "2d":
        vl = M.compute_vision_logits_2d(params, cfg, out.hidden_states,
                                        batch["vision_indices"])
    else:
        vl = M.compute_vision_logits(params, out.hidden_states)
    nll, _ = M.multicodebook_loss_terms(cfg, tl, vl, flag, batch["labels"],
                                        unified=cfg.unified_head)
    return jnp.mean(nll / denom)


def accum_train_step(state: TrainState, batch: Dict[str, Any], *,
                     cfg: LibraConfig, opt: optax.GradientTransformation,
                     dropout_seed: int = 0, grad_mask: Any = None,
                     remat=True
                     ) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """REAL gradient accumulation (reference shape: 8 micro x 4 accum,
    libra_pretrain.yaml:95-96): batch leaves carry a leading micro axis
    (A, ...); a `lax.scan` runs one rematerialised fwd/bwd per micro-batch
    and accumulates gradients, so peak activation memory stays at
    micro-batch scale while the result equals the concatenated batch
    EXACTLY (losses are normalised by group-total valid counts, computed
    from labels alone before the scan).

    With `grad_mask`, both the per-micro backward AND the carried
    accumulator cover only the trainable leaves (frozen_language drops
    ~70% of the gradient buffer and every frozen dL/dW matmul)."""
    labels = batch["labels"]                      # (A, Q, B, N)
    A = labels.shape[0]
    denom = jnp.maximum(
        jnp.sum(labels[..., 1:] != -100, axis=(0, 2, 3)), 1
    ).astype(jnp.float32)                         # (Q,) group totals
    enabled = M.dropout_enabled(cfg)
    key = jax.random.fold_in(jax.random.PRNGKey(dropout_seed), state.step)

    leaves, treedef = jax.tree_util.tree_flatten(state.params)
    m = (jax.tree_util.tree_leaves(grad_mask) if grad_mask is not None
         else [True] * len(leaves))
    tp0 = [p for p, mm in zip(leaves, m) if mm]

    def merge(tp_):
        it = iter(tp_)
        return jax.tree_util.tree_unflatten(
            treedef, [next(it) if mm else p for p, mm in zip(leaves, m)])

    def body(carry, xs):
        mb, idx = xs
        rng = jax.random.fold_in(key, idx) if enabled else None
        loss, gt = jax.value_and_grad(
            lambda tp_: _group_loss_fn(merge(tp_), cfg, mb, denom,
                                       dropout_rng=rng, remat=remat))(tp0)
        loss_sum, grad_sum = carry
        return (loss_sum + loss,
                jax.tree_util.tree_map(jnp.add, grad_sum, gt)), None

    zeros = jax.tree_util.tree_map(jnp.zeros_like, tp0)
    (loss, gt), _ = jax.lax.scan(
        body, (jnp.float32(0.0), zeros), (batch, jnp.arange(A)))
    it = iter(gt)
    grads = jax.tree_util.tree_unflatten(
        treedef, [next(it) if mm else jnp.zeros_like(p)
                  for p, mm in zip(leaves, m)])
    gm = grad_mask if grad_mask is not None and not all(m) else None
    return _finish_step(state, loss, grads, gt, opt=opt, grad_mask=gm)


# Batch arrays keyed by name: codebook-major leaves are (Q, B, N).
_CODEBOOK_MAJOR = ("input_ids", "labels")


def _neutral_pad_vals(cfg: LibraConfig) -> Dict[str, Any]:
    """Loss/attention-neutral token-pad values: mask 0, labels -100,
    vision_indices = text."""
    return {"input_ids": cfg.pad_token_id, "attention_mask": 0,
            "vision_indices": cfg.max_vision_token_length,
            "labels": -100, "coninous_signal": 0.0}


def stack_micro_batches(micro_batches, cfg: LibraConfig) -> Dict[str, Any]:
    """Right-pad each prepared micro-batch to the group's max sequence
    length and stack on a new leading micro axis (A, ...)."""
    import numpy as np

    pad_val = _neutral_pad_vals(cfg)
    N = max(mb["attention_mask"].shape[-1] for mb in micro_batches)

    def pad_one(k, v):
        v = np.asarray(v)
        seq_axis = 2 if k in _CODEBOOK_MAJOR else 1
        extra = N - v.shape[seq_axis]
        if extra == 0:
            return v
        width = [(0, 0)] * v.ndim
        width[seq_axis] = (0, extra)
        return np.pad(v, width, constant_values=pad_val.get(k, 0))

    out: Dict[str, Any] = {}
    for k in micro_batches[0]:
        if micro_batches[0][k] is None:
            out[k] = None
            continue
        out[k] = np.stack([pad_one(k, mb[k]) for mb in micro_batches])
    return out


def pad_batch_tokens(batch: Dict[str, Any], cfg: LibraConfig,
                     multiple: int) -> Dict[str, Any]:
    """Neutral right-pad of the token axis N to a multiple (sequence-
    parallel meshes need N divisible by the "seq" axis).

    REQUIRES right-padded rows (per-row attention_mask non-increasing --
    the production tokenizer's padding_side="right" default). Right-pad
    is exactly loss-neutral: appended keys are masked out of every REAL
    query row, and the appended query rows carry -100 labels. It is NOT
    neutral for left-padded rows: a mask-0 query row has every key at
    BIG_NEG, so its softmax is UNIFORM over all Nk keys (not "attends
    nothing") and its output is mean(V) INCLUDING the appended pad keys;
    with left-padding the shifted CE reads the first real token's label
    from that drifting position (measured 2.7e-4 rel loss shift from one
    pad token -- ADVICE r3 finding 1)."""
    import numpy as np

    N = batch["attention_mask"].shape[-1]
    extra = (-N) % multiple
    if extra == 0:
        return batch
    am = np.asarray(batch["attention_mask"])
    if (np.diff(am.astype(np.int8), axis=-1) > 0).any():
        raise ValueError(
            "pad_batch_tokens needs right-padded rows (attention_mask "
            "non-increasing per row); left-padded rows make seq-axis "
            "padding non-loss-neutral (see docstring)")
    pad_val = _neutral_pad_vals(cfg)
    out: Dict[str, Any] = {}
    for k, v in batch.items():
        if v is None:
            out[k] = None
            continue
        v = np.asarray(v)
        seq_axis = v.ndim - 2 if k == "coninous_signal" else v.ndim - 1
        width = [(0, 0)] * v.ndim
        width[seq_axis] = (0, extra)
        out[k] = np.pad(v, width, constant_values=pad_val.get(k, 0))
    return out


class Trainer:
    """Mesh-aware trainer: places params/optimizer state with GSPMD
    shardings and runs a single compiled train step."""

    def __init__(self, cfg: LibraConfig, params: Any, mesh: Mesh,
                 opt_cfg: Optional[OptimizerConfig] = None,
                 offload_opt_state: bool = False, remat=True):
        """offload_opt_state: keep Adam moments in pinned host memory
        (the reference's DeepSpeed ZeRO-Offload configs, SURVEY.md
        section 2.5) -- XLA streams them over PCIe per step.
        remat: rematerialisation policy for the layer scan (True/"full",
        "dots", "big_dots", "names:..." -- models.libra._remat_policy);
        "full" is the proven 11B fsdp8 fit, the names policies trade
        HBM for skipped backward recompute (docs/training.md)."""
        self.cfg = cfg
        self.mesh = mesh
        self.opt_cfg = opt_cfg or OptimizerConfig()
        self.opt = make_optimizer(self.opt_cfg, params)

        pshard = param_shardings(mesh, params)
        params = jax.device_put(params, pshard)
        init = functools.partial(init_state, opt=self.opt)
        # optimizer moments are zeros_like constants -- GSPMD propagation
        # leaves them replicated; pin the ZeRO layout explicitly
        sshard = state_shardings(mesh, params, jax.eval_shape(init, params))
        with jax.set_mesh(mesh):
            self.state = jax.jit(init, out_shardings=sshard)(params)

        # ZeRO-Offload equivalent: Adam moment matrices parked in pinned
        # host memory between steps, streamed to device around the compiled
        # step (outside jit: current XLA rejects in-program memory
        # annotations on partially-replicated buffers)
        self._offload = offload_opt_state
        if offload_opt_state:
            self._dev_shard = jax.tree_util.tree_map(
                lambda a: a.sharding, self.state.opt_state)
            self._host_shard = jax.tree_util.tree_map(
                lambda a: (a.sharding.with_memory_kind("pinned_host")
                           if a.ndim >= 2 else a.sharding),
                self.state.opt_state)
            self.state = self.state._replace(
                opt_state=jax.device_put(self.state.opt_state,
                                         self._host_shard))
        # trainable-only gradients when any freeze policy is active (the
        # mask is static python bools -- safe to close over the jit)
        from libra_tpu.training.optimizer import trainable_mask
        gmask = trainable_mask(params, self.opt_cfg)
        if all(jax.tree_util.tree_leaves(gmask)):
            gmask = None
        self._step = jax.jit(
            functools.partial(train_step, cfg=cfg, opt=self.opt,
                              grad_mask=gmask, remat=remat),
            donate_argnums=(0,))
        self._accum_step = jax.jit(
            functools.partial(accum_train_step, cfg=cfg, opt=self.opt,
                              grad_mask=gmask, remat=remat),
            donate_argnums=(0,))
        self._eval = jax.jit(functools.partial(eval_step, cfg=cfg))

    def shard_batch(self, batch: Dict[str, Any],
                    stacked: bool = False) -> Dict[str, Any]:
        seq = dict(zip(self.mesh.axis_names, self.mesh.devices.shape)
                   ).get("seq", 1)
        if seq > 1:
            batch = pad_batch_tokens(batch, self.cfg, seq)
        shardings = data_shardings(self.mesh, batch, stacked=stacked)
        return {k: (None if v is None
                    else jax.device_put(jnp.asarray(v), shardings[k]))
                for k, v in batch.items()}

    def _run_step(self, fn, batch) -> Dict[str, jax.Array]:
        with jax.set_mesh(self.mesh):
            state = self.state
            if self._offload:
                state = state._replace(opt_state=jax.device_put(
                    state.opt_state, self._dev_shard))
            state, metrics = fn(state, batch)
            if self._offload:
                state = state._replace(opt_state=jax.device_put(
                    state.opt_state, self._host_shard))
            self.state = state
        return metrics

    def step(self, batch: Dict[str, Any]) -> Dict[str, jax.Array]:
        return self._run_step(self._step, self.shard_batch(batch))

    def step_accum(self, micro_batches) -> Dict[str, jax.Array]:
        """One optimizer step accumulating over a list of prepared
        micro-batches (real accumulation: peak memory ~ one micro-batch)."""
        if len(micro_batches) == 1:
            return self.step(micro_batches[0])
        stacked = stack_micro_batches(micro_batches, self.cfg)
        return self._run_step(self._accum_step,
                              self.shard_batch(stacked, stacked=True))

    def evaluate(self, batches) -> float:
        losses = []
        with jax.set_mesh(self.mesh):
            for batch in batches:
                losses.append(float(self._eval(self.state,
                                               self.shard_batch(batch))))
        return sum(losses) / max(len(losses), 1)
