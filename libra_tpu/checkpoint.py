"""Checkpointing: PyTorch/HF reference weights -> JAX pytrees, plus Orbax
native save/restore.

The reference checkpoint layout (README.md:53-83): HF-format decoder weights
(config.json + pytorch_model*.bin / *.safetensors), a `vqgan.ckpt` Lightning
state_dict, `vision_tokenizer_config.yaml`, and a nested CLIP dir. This
module maps those tensors onto the libra_tpu parameter trees:

* torch Linear weights are (out, in) -> transposed to x @ W orientation;
* LibraLinear factors weight_A (bottleneck, in) / weight_B (out, bottleneck)
  -> wa (in, bottleneck) / wb (bottleneck, out)
  (reference: modeling_libra.py:167-173);
* torch Conv2d (out, in, kh, kw) -> HWIO (kh, kw, in, out);
* multi-head module lists are stacked along a leading axis to match the
  scanned/stacked layouts here.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from libra_tpu.config import CLIPVisionConfig, LibraConfig, VQGANConfig


# ---------------------------------------------------------------------------
# Raw state-dict loading
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load all torch/safetensors weight files in an HF checkpoint dir (or a
    single file) into a flat name->np.ndarray dict."""
    p = Path(path)
    files: List[Path] = []
    if p.is_dir():
        files = sorted(p.glob("*.safetensors")) or sorted(p.glob("pytorch_model*.bin"))
        if not files:
            raise FileNotFoundError(f"no weight files in {p}")
    else:
        files = [p]

    out: Dict[str, np.ndarray] = {}
    for f in files:
        if f.suffix == ".safetensors":
            try:
                from safetensors.numpy import load_file
                out.update(load_file(str(f)))
            except (TypeError, ValueError):
                # bf16 tensors have no numpy dtype; mirror the .bin path and
                # upcast through torch (common for LLaMA-family exports)
                import torch
                from safetensors.torch import load_file as load_pt
                for k, v in load_pt(str(f)).items():
                    out[k] = (v.float().numpy()
                              if v.dtype == torch.bfloat16 else v.numpy())
        else:
            import torch
            sd = torch.load(str(f), map_location="cpu", weights_only=True)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            for k, v in sd.items():
                out[k] = v.float().numpy() if v.dtype == __import__("torch").bfloat16 \
                    else v.numpy()
    return out


def strip_prefixes(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Legacy wrapper-prefix stripping (reference: modeling_libra.py:1311-1340
    handles 'model.model.' / 'module.model.' wrapped state dicts)."""
    keys = list(sd.keys())
    for prefix in ("model.model.", "module.model."):
        if any(k.startswith(prefix) for k in keys):
            outer = prefix.split(".")[0] + "."
            return {k[len(outer):]: v for k, v in sd.items()
                    if k.startswith(outer)}
    return sd


# ---------------------------------------------------------------------------
# Libra decoder conversion
# ---------------------------------------------------------------------------

def _t(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.T)


def _low_rank(sd, prefix: str) -> Dict[str, np.ndarray]:
    return {"wa": _t(sd[f"{prefix}.weight_A"]),
            "wb": _t(sd[f"{prefix}.weight_B"])}


def convert_libra_state_dict(sd: Dict[str, np.ndarray],
                             cfg: LibraConfig) -> Dict[str, Any]:
    """Reference LibraForCausalLM state dict -> libra_tpu param pytree."""
    sd = strip_prefixes(sd)
    L = cfg.num_hidden_layers
    Q = cfg.vision_codebook_num
    dt = cfg.params_dtype

    def stack_layers(fn):
        return np.stack([fn(i) for i in range(L)])

    def tree_stack(fn):
        """Stack per-layer dicts leaf-wise."""
        per = [fn(i) for i in range(L)]
        return {k: (np.stack([p[k] for p in per])
                    if not isinstance(per[0][k], dict)
                    else {k2: np.stack([p[k][k2] for p in per])
                          for k2 in per[0][k]})
                for k in per[0]}

    def layer_attn(i):
        a = f"model.layers.{i}.self_attn"
        out = {
            "q_proj": _t(sd[f"{a}.q_proj.weight"]),
            "k_proj": _t(sd[f"{a}.k_proj.weight"]),
            "v_proj": _t(sd[f"{a}.v_proj.weight"]),
            "o_proj": _t(sd[f"{a}.o_proj.weight"]),
            "vision_q": _low_rank(sd, f"{a}.vision_q_proj"),
            "vision_k": _low_rank(sd, f"{a}.vision_k_proj"),
            "vision_v": _low_rank(sd, f"{a}.vision_v_proj"),
            "vision_o": _low_rank(sd, f"{a}.vision_o_proj"),
        }
        if cfg.use_bridge:
            out.update({
                "k_bridge_lang": _low_rank(sd, f"{a}.vision_k_bridge_on_language"),
                "k_bridge_vis": _low_rank(sd, f"{a}.vision_k_bridge_on_vision"),
                "v_bridge_lang": _low_rank(sd, f"{a}.vision_v_bridge_on_language"),
                "v_bridge_vis": _low_rank(sd, f"{a}.vision_v_bridge_on_vision"),
            })
        return out

    def layer_mlp(i):
        m = f"model.layers.{i}.mlp"
        return {
            "gate_proj": _t(sd[f"{m}.gate_proj.weight"]),
            "up_proj": _t(sd[f"{m}.up_proj.weight"]),
            "down_proj": _t(sd[f"{m}.down_proj.weight"]),
            "vision_gate": _low_rank(sd, f"{m}.vision_gate_proj"),
            "vision_up": _low_rank(sd, f"{m}.vision_up_proj"),
            "vision_down": _low_rank(sd, f"{m}.vision_down_proj"),
        }

    layers = {
        "attn": tree_stack(layer_attn),
        "mlp": tree_stack(layer_mlp),
        "input_layernorm": stack_layers(
            lambda i: sd[f"model.layers.{i}.input_layernorm.weight"]),
        "post_attention_layernorm": stack_layers(
            lambda i: sd[f"model.layers.{i}.post_attention_layernorm.weight"]),
        "vision_input_layernorm": stack_layers(
            lambda i: sd[f"model.layers.{i}.vision_input_layernorm.weight"]),
        "vision_post_attention_layernorm": stack_layers(
            lambda i: sd[f"model.layers.{i}.vision_post_attention_layernorm.weight"]),
    }

    params: Dict[str, Any] = {
        "embed_tokens": sd["model.embed_tokens.weight"],
        "vision_embed_tokens": np.stack(
            [sd[f"model.vision_embed_tokens.{q}.weight"] for q in range(Q)]),
        "layers": layers,
        "norm": sd["model.norm.weight"],
        "vision_norm": sd["model.vision_norm.weight"],
        "lm_head": _t(sd["lm_head.weight"]),
        "vision_lm_head": np.stack(
            [_t(sd[f"vision_lm_head.heads.{q}.weight"]) for q in range(Q)]),
    }
    if cfg.concat_signals:
        params["signal_proj"] = _t(
            sd["model.vision_contiguous_signal_processor.weight"])
        if cfg.norm_signals:
            params["signal_norm"] = sd["model.vision_signal_norm.weight"]
    else:
        params["signal_proj"] = _t(
            sd["model.vision_contiguous_signal_processor.weight"])
    if cfg.use_vision_position_embedding:
        params["vision_position_embedding"] = \
            sd["model.vision_position_embedding.weight"]
    if cfg.vision_prediction_mode == "2d":
        params["vision_hidden_placeholder"] = sd["vision_hidden_placeholder"]

    return _to_jax(params, dt)


def _to_jax(tree: Any, dtype) -> Any:
    import jax
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), tree)


# ---------------------------------------------------------------------------
# Meta-format LLaMA conversion
# ---------------------------------------------------------------------------

def convert_meta_llama_state_dict(sd: Dict[str, np.ndarray],
                                  cfg) -> Dict[str, Any]:
    """Meta consolidated.*.pth layout -> libra_tpu.models.llama tree.

    Equivalent of the reference's Meta->HF converter
    (llama/convert_llama_weight_to_hf.py): Meta stores rotary dims
    interleaved; the GPT-NeoX layout used here (and by HF) needs wq/wk rows
    permuted with the standard de-interleave."""
    D = cfg.hidden_size
    H = cfg.num_attention_heads
    hd = D // H
    L = cfg.num_hidden_layers

    def permute(w):
        # (D, D) rows grouped per head: interleaved pairs -> halves
        return (np.asarray(w).reshape(H, hd // 2, 2, D)
                .transpose(0, 2, 1, 3).reshape(D, D))

    t = lambda x: np.ascontiguousarray(np.asarray(x).T)

    def stack(fn):
        per = [fn(i) for i in range(L)]
        return {k: np.stack([p[k] for p in per]) for k in per[0]}

    layers = stack(lambda i: {
        "q_proj": t(permute(sd[f"layers.{i}.attention.wq.weight"])),
        "k_proj": t(permute(sd[f"layers.{i}.attention.wk.weight"])),
        "v_proj": t(sd[f"layers.{i}.attention.wv.weight"]),
        "o_proj": t(sd[f"layers.{i}.attention.wo.weight"]),
        "gate_proj": t(sd[f"layers.{i}.feed_forward.w1.weight"]),
        "up_proj": t(sd[f"layers.{i}.feed_forward.w3.weight"]),
        "down_proj": t(sd[f"layers.{i}.feed_forward.w2.weight"]),
        "input_layernorm": np.asarray(sd[f"layers.{i}.attention_norm.weight"]),
        "post_attention_layernorm": np.asarray(
            sd[f"layers.{i}.ffn_norm.weight"]),
    })
    tree = {
        "embed_tokens": np.asarray(sd["tok_embeddings.weight"]),
        "layers": layers,
        "norm": np.asarray(sd["norm.weight"]),
        "lm_head": t(sd["output.weight"]),
    }
    return _to_jax(tree, cfg.params_dtype)


# ---------------------------------------------------------------------------
# CLIP conversion
# ---------------------------------------------------------------------------

def convert_clip_state_dict(sd: Dict[str, np.ndarray],
                            cfg: CLIPVisionConfig) -> Dict[str, Any]:
    """HF CLIPVisionModel state dict -> libra_tpu.models.clip tree."""
    pre = "vision_model."
    if not any(k.startswith(pre) for k in sd):
        pre = ""
    P = cfg.patch_size

    def dense(name):
        return {"w": _t(sd[f"{name}.weight"]), "b": sd[f"{name}.bias"]}

    def ln(name):
        return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}

    def layer(i):
        b = f"{pre}encoder.layers.{i}"
        return {
            "ln1": ln(f"{b}.layer_norm1"), "ln2": ln(f"{b}.layer_norm2"),
            "q": dense(f"{b}.self_attn.q_proj"),
            "k": dense(f"{b}.self_attn.k_proj"),
            "v": dense(f"{b}.self_attn.v_proj"),
            "o": dense(f"{b}.self_attn.out_proj"),
            "fc1": dense(f"{b}.mlp.fc1"), "fc2": dense(f"{b}.mlp.fc2"),
        }

    L = cfg.num_hidden_layers
    per = [layer(i) for i in range(L)]
    layers = {k: {k2: np.stack([p[k][k2] for p in per]) for k2 in per[0][k]}
              for k in per[0]}

    # torch conv (out, in, kh, kw) -> flattened (kh*kw*in, out) matching
    # embed_patches' (ph, pw, c) flattening order
    pw = sd[f"{pre}embeddings.patch_embedding.weight"]
    patch = np.ascontiguousarray(
        pw.transpose(2, 3, 1, 0).reshape(P * P * pw.shape[1], pw.shape[0]))

    params = {
        "class_embedding": sd[f"{pre}embeddings.class_embedding"],
        "patch_embedding": patch,
        "position_embedding": sd[f"{pre}embeddings.position_embedding.weight"],
        # HF misspells this attribute as pre_layrnorm
        "pre_layernorm": ln(f"{pre}pre_layrnorm"),
        "post_layernorm": ln(f"{pre}post_layernorm"),
        "layers": layers,
    }
    return _to_jax(params, jnp.float32)


def load_nested_clip(clip_dir: str, vq_cfg: VQGANConfig):
    """Load the nested CLIP checkpoint dir of the reference layout
    (README.md:53-83: `<ckpt>/openai-clip-vit-large-patch14-336/`, named by
    the yaml's ddconfig.encoder_name and consumed by
    `CLIPVisionModel.from_pretrained`, clip_encoder.py:40-44).

    Returns (vq_cfg with its `clip` sub-config replaced by the dir's
    config.json, converted CLIP params). The dir may hold either a full
    CLIPConfig (openai/clip-vit-* style, vision half under "vision_config")
    or a bare CLIPVisionConfig; the weight files may carry the joint model
    (text_model.* keys are simply ignored by the converter)."""
    import dataclasses

    with open(Path(clip_dir) / "config.json") as f:
        d = json.load(f)
    d = d.get("vision_config", d)
    clip_cfg = CLIPVisionConfig.from_dict(d)
    vq_cfg = dataclasses.replace(vq_cfg, clip=clip_cfg)
    sd = load_torch_state_dict(clip_dir)
    # full-CLIP exports prefix the vision half as vision_model.*; a
    # CLIPVisionModel export uses the same prefix, so both pass through
    return vq_cfg, convert_clip_state_dict(sd, clip_cfg)


# ---------------------------------------------------------------------------
# VQGAN conversion
# ---------------------------------------------------------------------------

def _conv(sd, name):
    w = sd[f"{name}.weight"]
    if w.ndim == 4:
        w = np.ascontiguousarray(w.transpose(2, 3, 1, 0))  # OIHW -> HWIO
    return {"w": w, "b": sd[f"{name}.bias"]}


def _gn(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _resnet(sd, name):
    p = {"norm1": _gn(sd, f"{name}.norm1"), "conv1": _conv(sd, f"{name}.conv1"),
         "norm2": _gn(sd, f"{name}.norm2"), "conv2": _conv(sd, f"{name}.conv2")}
    if f"{name}.nin_shortcut.weight" in sd:
        p["nin_shortcut"] = _conv(sd, f"{name}.nin_shortcut")
    return p


def _attn(sd, name):
    return {"norm": _gn(sd, f"{name}.norm"),
            "q": _conv(sd, f"{name}.q"), "k": _conv(sd, f"{name}.k"),
            "v": _conv(sd, f"{name}.v"),
            "proj_out": _conv(sd, f"{name}.proj_out")}


def convert_vqgan_encoder(sd: Dict[str, np.ndarray],
                          cfg: VQGANConfig) -> Dict[str, Any]:
    """taming conv Encoder state dict (keys under 'encoder.') -> the
    libra_tpu.models.vqgan encoder tree (reference: model.py:380-471)."""
    from libra_tpu.models.vqgan import encoder_plan

    levels, _ = encoder_plan(cfg)
    enc: Dict[str, Any] = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "mid_block_1": _resnet(sd, "encoder.mid.block_1"),
        "mid_attn_1": _attn(sd, "encoder.mid.attn_1"),
        "mid_block_2": _resnet(sd, "encoder.mid.block_2"),
        "norm_out": _gn(sd, "encoder.norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
        "down": [],
    }
    for i, lev in enumerate(levels):
        entry: Dict[str, Any] = {"block": [], "attn": []}
        for j in range(cfg.num_res_blocks):
            entry["block"].append(_resnet(sd, f"encoder.down.{i}.block.{j}"))
            if lev["has_attn"]:
                entry["attn"].append(_attn(sd, f"encoder.down.{i}.attn.{j}"))
        if lev["has_down"]:
            entry["downsample_conv"] = _conv(
                sd, f"encoder.down.{i}.downsample.conv")
        enc["down"].append(entry)
    return enc


# torchvision VGG16 `features` indices of the 13 conv layers; the LPIPS
# module preserves these indices inside its net.slice{1..5} submodules
# (reference: taming/modules/losses/lpips.py:79-96)
_VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def _lpips_slice_of(feature_idx: int) -> int:
    for s, hi in enumerate((4, 9, 16, 23, 30), start=1):
        if feature_idx < hi:
            return s
    raise ValueError(feature_idx)


def convert_vgg16_lpips(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torch LPIPS weights -> the libra_tpu.models.vqgan_train lpips tree
    {"vgg": {"convs": [{w HWIO, b}]*13}, "lins": [{w (1,1,C,1)}]*5}.

    Accepts either naming scheme (or a merge of both):
      * torchvision VGG16: `features.{i}.weight/bias` (the reference builds
        its net from `models.vgg16(pretrained=True).features`,
        lpips.py:17-18,82);
      * reference LPIPS module state_dict: `net.slice{s}.{i}.weight/bias`
        plus the downloaded vgg_lpips lin heads `lin{k}.model.1.weight`
        (lpips.py:19-30, NetLinLayer 1x1 conv at model index 1).
    """
    def get(name):
        if name in sd:
            return np.asarray(sd[name])
        return None

    convs = []
    for i in _VGG16_CONV_IDX:
        s = _lpips_slice_of(i)
        w = get(f"features.{i}.weight")
        b = get(f"features.{i}.bias")
        if w is None:
            w = get(f"net.slice{s}.{i}.weight")
            b = get(f"net.slice{s}.{i}.bias")
        if w is None:
            raise KeyError(f"VGG16 conv {i} missing (features.{i}.weight / "
                           f"net.slice{s}.{i}.weight)")
        convs.append({"w": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
                      "b": np.asarray(b)})

    lins = []
    for k in range(5):
        w = get(f"lin{k}.model.1.weight")
        if w is None:
            raise KeyError(f"LPIPS lin head lin{k}.model.1.weight missing "
                           "(download the taming vgg_lpips checkpoint)")
        lins.append({"w": np.ascontiguousarray(w.transpose(2, 3, 1, 0))})
    return {"vgg": {"convs": convs}, "lins": lins}


def load_lpips_params(vgg16_path: str, lpips_lins_path: str) -> Dict[str, Any]:
    """Convenience loader: torchvision vgg16 state dict file + the taming
    `vgg.pth` lin-head checkpoint -> converted LPIPS params."""
    sd = dict(load_torch_state_dict(vgg16_path))
    sd.update(load_torch_state_dict(lpips_lins_path))
    return convert_vgg16_lpips(sd)


def convert_vqgan_state_dict(sd: Dict[str, np.ndarray], cfg: VQGANConfig,
                             clip_params: Optional[Any] = None) -> Dict[str, Any]:
    """Reference VQModel state dict (vqgan.ckpt['state_dict'], loss keys
    stripped) -> libra_tpu.models.vqgan tree. The CLIP tower weights live in
    the same state dict under encoder.vision_tower.* OR are supplied
    separately via clip_params."""
    from libra_tpu.models.vqgan import decoder_plan
    n_lev = len(cfg.ch_mult)
    levels, _ = decoder_plan(cfg)

    dec: Dict[str, Any] = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid_block_1": _resnet(sd, "decoder.mid.block_1"),
        "mid_attn_1": _attn(sd, "decoder.mid.attn_1"),
        "mid_block_2": _resnet(sd, "decoder.mid.block_2"),
        "norm_out": _gn(sd, "decoder.norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
        "up": [],
    }
    if cfg.norm_first and "decoder.first_norm.weight" in sd:
        dec["first_norm"] = _gn(sd, "decoder.first_norm")
    # our up[] is in execution order = torch up[n-1], up[n-2], ..., up[0]
    for lev in levels:
        i = lev["i_level"]
        entry: Dict[str, Any] = {"block": [], "attn": []}
        for j in range(cfg.num_res_blocks + 1):
            entry["block"].append(_resnet(sd, f"decoder.up.{i}.block.{j}"))
            if lev["has_attn"]:
                entry["attn"].append(_attn(sd, f"decoder.up.{i}.attn.{j}"))
        if lev["up_scale"] is not None:
            entry["upsample_conv"] = _conv(sd, f"decoder.up.{i}.upsample.conv")
        dec["up"].append(entry)

    params: Dict[str, Any] = {
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
        "decoder": dec,
    }
    if "encoder.conv_in.weight" in sd:   # conv-encoder tokenizer variant
        params["encoder"] = convert_vqgan_encoder(sd, cfg)
    if clip_params is not None:
        params["clip"] = clip_params
    else:
        clip_sd = {k[len("encoder.vision_tower."):]: v for k, v in sd.items()
                   if k.startswith("encoder.vision_tower.")}
        if clip_sd:
            params["clip"] = convert_clip_state_dict(clip_sd, cfg.clip)
    return _to_jax({k: v for k, v in params.items() if k != "clip"},
                   jnp.float32) | (
        {"clip": params["clip"]} if "clip" in params else {})


# ---------------------------------------------------------------------------
# Orbax native checkpointing
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, state: Any, step: Optional[int] = None):
    """Async-capable Orbax save of a (possibly sharded) pytree."""
    import orbax.checkpoint as ocp
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / (f"step_{step}" if step is not None else "state"),
                   state, force=True)


def restore_checkpoint(path: str, target: Any, step: Optional[int] = None) -> Any:
    import orbax.checkpoint as ocp
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(
            path / (f"step_{step}" if step is not None else "state"), target)


import jax  # noqa: E402  (used by _to_jax)
