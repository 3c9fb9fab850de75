"""Multi-host process helpers.

Equivalent of the reference dist utils (libra/common/dist_utils.py:17-137),
expressed over JAX's multi-process runtime instead of torch.distributed:
rank/world-size map to jax.process_index/process_count; the NCCL
init_process_group + 365-day-timeout dance is replaced by
jax.distributed.initialize(); barriers are a tiny psum over all devices
(collectives ride ICI/DCN via XLA).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import numpy as np


def is_dist_avail_and_initialized() -> bool:
    return jax.process_count() > 1


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def init_distributed_mode(coordinator_address: Optional[str] = None,
                          num_processes: Optional[int] = None,
                          process_id: Optional[int] = None) -> None:
    """Initialize the multi-host runtime from env or explicit args.
    No-op when single-process or already initialized."""
    if jax.process_count() > 1:
        return
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None:
        return
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes or int(os.environ.get("JAX_NUM_PROCESSES", 1)),
        process_id=process_id or int(os.environ.get("JAX_PROCESS_ID", 0)))


def barrier() -> None:
    """Cross-process barrier: an all-reduce over one scalar per device."""
    if jax.process_count() <= 1:
        return
    x = jax.numpy.ones(())
    jax.block_until_ready(
        jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(
            jax.numpy.broadcast_to(x, (jax.local_device_count(),))))


def main_process_first(fn):
    """Run fn on rank 0, barrier, then on the others (the reference's
    cached-download-with-barrier pattern, dist_utils.py:118-137)."""
    @functools.wraps(fn)
    def wrapper(*a, **kw):
        if is_main_process():
            out = fn(*a, **kw)
            barrier()
            return out
        barrier()
        return fn(*a, **kw)
    return wrapper


def print_main(*args, **kwargs) -> None:
    """Rank-0-only print (reference: dist_utils.py:17-30)."""
    if is_main_process():
        print(*args, **kwargs)
