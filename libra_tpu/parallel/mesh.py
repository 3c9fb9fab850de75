"""Device mesh construction.

The reference scales with torchrun + NCCL + DeepSpeed ZeRO
(SURVEY.md section 2.5). The TPU-native equivalent is a
`jax.sharding.Mesh` with three axes:

  data  -- pure data parallelism (gradients psum over ICI/DCN; the
           reference's DP all-reduce);
  fsdp  -- parameter/optimizer sharding fused with data parallelism
           (the reference's ZeRO-2/3);
  model -- tensor parallelism over attention heads / MLP intermediate
           (absent in the reference; added for 11B serving on v5e-8);
  seq   -- sequence (context) parallelism over the TOKEN axis of
           activations (absent in the reference): long-context prefill
           and training shard N across chips; parameters replicate over
           this axis and GSPMD inserts the attention K/V all-gathers.

XLA emits all collectives from sharding annotations; no NCCL-style
explicit communication code exists anywhere in this framework.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("data", "fsdp", "model", "seq")


def make_mesh(data: int = 1, fsdp: int = 1, model: int = 1, seq: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    n = data * fsdp * model * seq
    if n > len(devices):
        raise ValueError(f"mesh {data}x{fsdp}x{model}x{seq} needs {n} "
                         f"devices, have {len(devices)}")
    # Keep the latency-critical "model" (TP) groups ADJACENT in the flat
    # device order: reshape with seq OUTSIDE model, then move the axes
    # into name order. A plain (data, fsdp, model, seq) reshape strides
    # seq BETWEEN TP peers, degrading TP collective locality over ICI
    # whenever seq > 1 (ADVICE r3 finding 2).
    dev = (np.asarray(devices[:n]).reshape(data, fsdp, seq, model)
           .transpose(0, 1, 3, 2))
    return Mesh(dev, AXES)


def default_mesh(n_devices: Optional[int] = None, model: int = 1) -> Mesh:
    """All devices on (fsdp, model); data=1. For v5e-8 decode use model=8."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model={model}")
    return make_mesh(data=1, fsdp=n // model, model=model,
                     devices=devices[:n])
