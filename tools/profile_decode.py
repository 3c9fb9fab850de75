import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
import bench
from __graft_entry__ import _example_batch, _flagship_cfg
from libra_tpu.generation import GenerationConfig, Generator

cfg = _flagship_cfg(32)
params = bench._device_quantized_params(cfg)
print("params ready", flush=True)
B, text_len, max_new = 4, 32, 64
ids, mask, vi, sig = _example_batch(cfg, B=B, text_len=text_len)
inputs = {"input_ids": ids, "attention_mask": mask,
          "vision_indices": vi, "coninous_signal": sig}
gen = GenerationConfig(max_new_tokens=max_new, eos_token_id=-1, kv_quant=True)
g = Generator(params, cfg)
bench._sync(g(inputs, gen).sequences)
print("compiled", flush=True)
t0 = time.perf_counter(); bench._sync(g(inputs, gen).sequences)
print(f"steady: {(time.perf_counter()-t0)/max_new*1e3:.2f} ms/step", flush=True)
with jax.profiler.trace("/tmp/jaxtrace"):
    bench._sync(g(inputs, gen).sequences)
print("trace done", flush=True)
