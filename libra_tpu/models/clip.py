"""CLIP ViT vision encoder in JAX (ViT-L/14-336 for Libra).

Re-implements the vendored HF CLIPVisionModel forward path
(reference: libra/models/clip/modeling_clip.py:859-919) TPU-first:

* the stride-14 patch conv is a reshape + one big matmul (stride == kernel),
  which XLA maps straight onto the MXU;
* encoder layers are stacked and scanned;
* only the layers needed for the feature tap are executed: Libra consumes
  hidden_states[select_layer] (default -2, i.e. the input of the LAST layer;
  reference: clip_encoder.py:31-45), so the final layer is never run.

The CLS token is dropped and features reshaped to a (24, 24) square
(reference: clip_encoder.py:47-51).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from libra_tpu.config import CLIPVisionConfig

Params = Dict[str, Any]


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def _layer_norm(x: jax.Array, p: Params, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def init_params(key, cfg: CLIPVisionConfig) -> Params:
    D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    P = cfg.patch_size
    n_pos = cfg.num_patches + 1
    keys = iter(jax.random.split(key, 8))
    nk = lambda: next(keys)
    dt = jnp.float32

    def dense(key, d_in, d_out):
        k1, _ = jax.random.split(key)
        w = jax.random.normal(k1, (d_in, d_out), dt) * (d_in ** -0.5)
        return {"w": w, "b": jnp.zeros((d_out,), dt)}

    def ln():
        return {"scale": jnp.ones((D,), dt), "bias": jnp.zeros((D,), dt)}

    def layer(key):
        ks = jax.random.split(key, 6)
        return {
            "ln1": ln(), "ln2": ln(),
            "q": dense(ks[0], D, D), "k": dense(ks[1], D, D),
            "v": dense(ks[2], D, D), "o": dense(ks[3], D, D),
            "fc1": dense(ks[4], D, I), "fc2": dense(ks[5], I, D),
        }

    layer_keys = jax.random.split(nk(), L)
    layers = jax.vmap(layer)(layer_keys)
    return {
        "class_embedding": jax.random.normal(nk(), (D,), dt) * 0.02,
        # patch embedding stored flattened: (P*P*3, D), matmul form
        "patch_embedding": jax.random.normal(nk(), (P * P * 3, D), dt) * 0.02,
        "position_embedding": jax.random.normal(nk(), (n_pos, D), dt) * 0.02,
        "pre_layernorm": {"scale": jnp.ones((D,), dt), "bias": jnp.zeros((D,), dt)},
        "post_layernorm": {"scale": jnp.ones((D,), dt), "bias": jnp.zeros((D,), dt)},
        "layers": layers,
    }


def embed_patches(params: Params, cfg: CLIPVisionConfig,
                  pixels: jax.Array) -> jax.Array:
    """pixels: (B, H, W, 3) NHWC normalized -> (B, 1+N, D) with CLS + pos."""
    B, H, W, C = pixels.shape
    P = cfg.patch_size
    gh, gw = H // P, W // P
    x = pixels.reshape(B, gh, P, gw, P, C).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, gh * gw, P * P * C)
    emb = x @ params["patch_embedding"].astype(x.dtype)          # (B, N, D)
    cls = jnp.broadcast_to(params["class_embedding"].astype(x.dtype),
                           (B, 1, cfg.hidden_size))
    h = jnp.concatenate([cls, emb], axis=1)
    return h + params["position_embedding"].astype(x.dtype)


def _encoder_layer(p: Params, cfg: CLIPVisionConfig, h: jax.Array) -> jax.Array:
    Hn, d = cfg.num_attention_heads, cfg.head_dim
    B, N, D = h.shape
    eps = cfg.layer_norm_eps

    res = h
    x = _layer_norm(h, p["ln1"], eps)
    q = (x @ p["q"]["w"] + p["q"]["b"]).reshape(B, N, Hn, d)
    k = (x @ p["k"]["w"] + p["k"]["b"]).reshape(B, N, Hn, d)
    v = (x @ p["v"]["w"] + p["v"]["b"]).reshape(B, N, Hn, d)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d ** -0.5)
    a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, N, D)
    h = res + (o @ p["o"]["w"] + p["o"]["b"])

    res = h
    x = _layer_norm(h, p["ln2"], eps)
    x = quick_gelu(x @ p["fc1"]["w"] + p["fc1"]["b"])
    h = res + (x @ p["fc2"]["w"] + p["fc2"]["b"])
    return h


def forward_features(params: Params, cfg: CLIPVisionConfig,
                     pixels: jax.Array, select_layer=-2,
                     square_output: bool = True) -> jax.Array:
    """Run the tower up to the tapped hidden state(s).

    HF's hidden_states tuple has num_layers+1 entries (embeddings first), so
    hidden_states[-2] == output of layer num_layers-1, i.e. we run
    (num_layers + select_layer + 1) layers. `select_layer` may also be an
    iterable of indices -- the tapped features are channel-concatenated,
    matching CLIPVisionTower's iterable select (reference:
    clip_encoder.py:22-51; consumed at vqgan.py:49 where quant_conv in-dim
    is hidden_size * len(select_layer)). CLS dropped; optionally reshaped to
    (B, g, g, C) NHWC square.
    """
    L = cfg.num_hidden_layers
    sel = ((select_layer,) if isinstance(select_layer, int)
           else tuple(select_layer))
    taps = []
    for s in sel:
        n = L + s + 1 if s < 0 else s
        if not (0 < n <= L):
            raise ValueError(f"select_layer {s} out of range")
        taps.append(n)

    h = embed_patches(params, cfg, pixels)
    h = _layer_norm(h, params["pre_layernorm"], cfg.layer_norm_eps)

    stacked = params["layers"]
    n_max = max(taps)
    run_params = jax.tree_util.tree_map(lambda a: a[:n_max], stacked)
    if len(taps) == 1:
        h, _ = jax.lax.scan(lambda c, p: (_encoder_layer(p, cfg, c), None),
                            h, run_params)
        feats = h
    else:
        def body(c, p):
            nh = _encoder_layer(p, cfg, c)
            return nh, nh
        _, ys = jax.lax.scan(body, h, run_params)   # (n_max, B, N, D)
        feats = jnp.concatenate([ys[n - 1] for n in taps], axis=-1)

    feats = feats[:, 1:]  # drop CLS ('patch' select, clip_encoder.py:39-40)
    if square_output:
        B, N, D = feats.shape
        g = int(N ** 0.5)
        assert g * g == N
        feats = feats.reshape(B, g, g, D)
    return feats


def preprocess(pixels: jax.Array, cfg: CLIPVisionConfig) -> jax.Array:
    """Device-side CLIP preprocessing on (B, H, W, 3) uint8/float [0,255]:
    resize shortest edge to image_size (bicubic, antialias), center-crop,
    rescale 1/255, normalize. Mirrors CLIPImageProcessor.preprocess
    (reference: clip/image_processing_clip.py:219-337)."""
    S = cfg.image_size
    B, H, W, C = pixels.shape
    x = pixels.astype(jnp.float32)
    if (H, W) != (S, S):
        scale = S / min(H, W)
        nh, nw = max(S, round(H * scale)), max(S, round(W * scale))
        x = jax.image.resize(x, (B, nh, nw, C), method="bicubic",
                             antialias=True)
        top, left = (nh - S) // 2, (nw - S) // 2
        x = x[:, top:top + S, left:left + S, :]
    x = x / 255.0
    mean = jnp.asarray(cfg.image_mean, jnp.float32)
    std = jnp.asarray(cfg.image_std, jnp.float32)
    return (x - mean) / std
