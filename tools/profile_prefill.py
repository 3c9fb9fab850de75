"""Profile the fused-vision VQA prefill program (the TTFT hot path).

Runs the bench_vqa_fused_full32 shape (full-32 int8, B=4, pixels in
prefill) with max_new_tokens=1 under jax.profiler.trace; aggregate the
xplane with tools/parse_trace.py. One TPU client only.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

import bench
from __graft_entry__ import _example_batch, _flagship_cfg, fast_fill
from libra_tpu.config import VQGANConfig
from libra_tpu.generation import GenerationConfig, Generator
from libra_tpu.models import vqgan as vqgan_model

B, text_len = 4, 32
cfg = _flagship_cfg(32)
params = bench._device_quantized_params(cfg)
print("params ready", flush=True)
vq_cfg = VQGANConfig(select_layer=(-2, -1))
vq_params = jax.device_put(jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype")
    and x.dtype == jnp.float32 else x,
    fast_fill(lambda: vqgan_model.init_params(jax.random.PRNGKey(0),
                                              vq_cfg))))
ids, mask, vi, _ = _example_batch(cfg, B=B, text_len=text_len)
img_start = np.full((B,), 8, np.int32)
pixels = np.random.RandomState(0).randint(
    0, 256, size=(B, 336, 336, 3)).astype(np.uint8)
inputs = {"input_ids": ids, "attention_mask": mask, "vision_indices": vi,
          "pixels": pixels, "img_start": img_start}
g = Generator(params, cfg, vq_params=vq_params, vq_cfg=vq_cfg)
gen1 = GenerationConfig(max_new_tokens=1, eos_token_id=-1, kv_quant=True,
                        a8_prefill=os.environ.get("A8", "1") == "1")
bench._sync(g(inputs, gen1).sequences)
print("compiled", flush=True)
t0 = time.perf_counter()
bench._sync(g(inputs, gen1).sequences)
print(f"steady TTFT: {(time.perf_counter() - t0) * 1e3:.1f} ms", flush=True)
with jax.profiler.trace("/tmp/jaxtrace_prefill"):
    bench._sync(g(inputs, gen1).sequences)
print("trace done", flush=True)
