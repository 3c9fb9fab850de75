"""Per-launch overhead of the Pallas int8 kernel: chain C kernels in a
fori_loop (traced trip count, one compile) and compare per-call time
against the pure streaming ideal. Also tests whether the persistent
compilation cache works through the axon tunnel."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


mode = sys.argv[1] if len(sys.argv) > 1 else "pallas"  # pallas | xla
C = int(sys.argv[2]) if len(sys.argv) > 2 else 8
K = F = 4096
M = 4

from libra_tpu.ops.pallas.int8_matmul import int8_matmul

qs = [jax.jit(lambda k: jax.lax.bitcast_convert_type(
    jax.random.bits(k, (K, F), jnp.uint8), jnp.int8))(jax.random.PRNGKey(i))
    for i in range(C)]
scale = jnp.full((1, F), 1 / 127, jnp.float32)
x0 = jnp.asarray(np.random.RandomState(0).randn(M, K), jnp.bfloat16)


@jax.jit
def run(n, x):
    def body(i, x):
        for q in qs:
            if mode == "pallas":
                x = (int8_matmul(x, q, scale) * 1e-2).astype(jnp.bfloat16)
            else:
                x = (jnp.einsum("mk,kf->mf", x,
                                q.astype(jnp.bfloat16) * (1 / 127)) * 1e-2)
        return x
    return jax.lax.fori_loop(0, n, body, x)


def sync(x):
    return np.asarray(x).ravel()[0]


t0 = time.perf_counter()
sync(run(5, x0))
print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)


def t(n):
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        sync(run(n, x0))
        d = time.perf_counter() - t0
        best = d if best is None else min(best, d)
    return best


per_iter = (t(45) - t(5)) / 40
per_call = per_iter / C
ideal = K * F / 622e9
print(f"{mode} C={C}: {per_call*1e6:.1f} us/call "
      f"(ideal {ideal*1e6:.1f} us, overhead {(per_call-ideal)*1e6:.1f} us)",
      flush=True)
