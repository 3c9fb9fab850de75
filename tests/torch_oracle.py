"""Independent PyTorch oracle of the Libra decoder semantics.

This is a from-scratch functional reimplementation of the behaviors
documented in SURVEY.md section 2.1 (boolean gather/scatter routing, K/V
clone bridging, fp32 softmax/RMSNorm upcasts, multi-codebook embedding and
heads) operating directly on a reference-named state dict. It exists to
verify BOTH the libra_tpu model math and the checkpoint name mapping: the
same state dict is converted with libra_tpu.checkpoint and must produce
identical logits.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import numpy as np
import torch
import torch.nn.functional as F


def make_reference_state_dict(cfg, seed=0) -> Dict[str, torch.Tensor]:
    """Random state dict using the reference's parameter names/shapes."""
    g = torch.Generator().manual_seed(seed)
    D, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    Vv, Q = cfg.vision_vocab_size, cfg.vision_codebook_num
    Db = D // cfg.vision_down_ratio
    Ib = I // cfg.vision_down_ratio
    r = cfg.bridge_rank
    S = cfg.contiguous_signal_size
    sd = {}

    def w(name, *shape, scale=0.02):
        sd[name] = torch.randn(*shape, generator=g) * scale

    def ones(name, *shape):
        sd[name] = torch.ones(*shape) + torch.randn(*shape, generator=g) * 0.02

    w("model.embed_tokens.weight", V, D)
    for q in range(Q):
        w(f"model.vision_embed_tokens.{q}.weight", Vv, D // Q)
    ones("model.vision_signal_norm.weight", S + D)
    w("model.vision_contiguous_signal_processor.weight", D, S + D)
    for i in range(cfg.num_hidden_layers):
        a = f"model.layers.{i}.self_attn"
        for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
            w(f"{a}.{n}.weight", D, D)
        for n in ("vision_q_proj", "vision_k_proj", "vision_v_proj",
                  "vision_o_proj"):
            w(f"{a}.{n}.weight_A", Db, D)
            w(f"{a}.{n}.weight_B", D, Db)
        for n in ("vision_k_bridge_on_language", "vision_k_bridge_on_vision",
                  "vision_v_bridge_on_language", "vision_v_bridge_on_vision"):
            w(f"{a}.{n}.weight_A", r, D)
            w(f"{a}.{n}.weight_B", D, r)
        m = f"model.layers.{i}.mlp"
        w(f"{m}.gate_proj.weight", I, D)
        w(f"{m}.up_proj.weight", I, D)
        w(f"{m}.down_proj.weight", D, I)
        for n in ("vision_gate_proj", "vision_up_proj"):
            w(f"{m}.{n}.weight_A", Ib, D)
            w(f"{m}.{n}.weight_B", I, Ib)
        w(f"{m}.vision_down_proj.weight_A", Db, I)
        w(f"{m}.vision_down_proj.weight_B", D, Db)
        for n in ("input_layernorm", "post_attention_layernorm",
                  "vision_input_layernorm", "vision_post_attention_layernorm"):
            ones(f"model.layers.{i}.{n}.weight", D)
    ones("model.norm.weight", D)
    ones("model.vision_norm.weight", D)
    w("lm_head.weight", V, D)
    for q in range(Q):
        w(f"vision_lm_head.heads.{q}.weight", Vv, D)
    return sd


def _rms(x, weight, eps):
    dt = x.dtype
    xf = x.float()
    var = xf.pow(2).mean(-1, keepdim=True)
    return (weight * (xf * torch.rsqrt(var + eps))).to(dt)


def _routed(x, flag, lang_fn, vis_fn):
    out = torch.empty(x.shape[:-1] + lang_fn(x[:1, :1]).shape[-1:],
                      dtype=x.dtype)
    out[~flag] = lang_fn(x[~flag])
    out[flag] = vis_fn(x[flag])
    return out


def _rope_tables(n, dim, base=10000.0):
    inv = 1.0 / (base ** (torch.arange(0, dim, 2).float() / dim))
    t = torch.arange(n).float()
    freqs = torch.outer(t, inv)
    emb = torch.cat([freqs, freqs], dim=-1)
    return emb.cos(), emb.sin()


def _rot_half(x):
    h = x.shape[-1] // 2
    return torch.cat([-x[..., h:], x[..., :h]], dim=-1)


def oracle_forward(sd: Dict[str, torch.Tensor], cfg, input_ids: np.ndarray,
                   attention_mask: np.ndarray, vision_indices: np.ndarray,
                   signal: Optional[np.ndarray]):
    """Returns (text_logits (B,N,V), vision_logits (Q,B,N,Vv)) fp32."""
    torch.set_grad_enabled(False)
    D = cfg.hidden_size
    H = cfg.num_attention_heads
    hd = D // H
    V, Vv, Q = cfg.vocab_size, cfg.vision_vocab_size, cfg.vision_codebook_num
    eps = cfg.rms_norm_eps

    ids = torch.from_numpy(np.asarray(input_ids)).long()
    mask = torch.from_numpy(np.asarray(attention_mask)).long()
    vi = torch.from_numpy(np.asarray(vision_indices)).long()
    flag = vi < cfg.max_vision_token_length
    B, N = flag.shape

    # --- embedding (multi-codebook + signal fusion) ---
    ids_local = ids.clone()
    ids_local[:, flag] -= V
    lang_emb = F.embedding(ids[0].clamp(0, V - 1),
                           sd["model.embed_tokens.weight"])
    vis_parts = [F.embedding(ids_local[q].clamp(0, Vv - 1),
                             sd[f"model.vision_embed_tokens.{q}.weight"])
                 for q in range(Q)]
    vis_emb = torch.cat(vis_parts, dim=-1)
    sig = (torch.from_numpy(np.asarray(signal)).float() if signal is not None
           else torch.zeros(B, N, cfg.contiguous_signal_size))
    cat = torch.cat([vis_emb, sig], dim=-1)
    cat = _rms(cat, sd["model.vision_signal_norm.weight"], eps)
    vis_emb = F.linear(cat, sd["model.vision_contiguous_signal_processor.weight"])
    h = torch.where(flag[..., None], vis_emb, lang_emb)

    # --- masks / positions ---
    pos = mask.cumsum(-1) - 1
    pos = pos.masked_fill(mask == 0, 1)
    causal = torch.full((N, N), torch.finfo(torch.float32).min)
    causal = torch.triu(causal, diagonal=1)[None, None]
    pad = (1.0 - mask[:, None, None, :].float())
    bias = causal + pad * torch.finfo(torch.float32).min
    cos_t, sin_t = _rope_tables(N, hd)
    cos = cos_t[pos][:, None]     # (B,1,N,hd)
    sin = sin_t[pos][:, None]

    def lin(name):
        return lambda x: F.linear(x, sd[name])

    def lr(name):
        return lambda x: F.linear(F.linear(x, sd[name + ".weight_A"]),
                                  sd[name + ".weight_B"])

    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}"
        a = f"{pre}.self_attn"
        hn = _routed(h, flag,
                     lambda x: _rms(x, sd[f"{pre}.input_layernorm.weight"], eps),
                     lambda x: _rms(x, sd[f"{pre}.vision_input_layernorm.weight"], eps))
        q = _routed(hn, flag, lin(f"{a}.q_proj.weight"), lr(f"{a}.vision_q_proj"))
        k = _routed(hn, flag, lin(f"{a}.k_proj.weight"), lr(f"{a}.vision_k_proj"))
        v = _routed(hn, flag, lin(f"{a}.v_proj.weight"), lr(f"{a}.vision_v_proj"))
        kb = _routed(hn, flag, lr(f"{a}.vision_k_bridge_on_language"),
                     lr(f"{a}.vision_k_bridge_on_vision"))
        vb = _routed(hn, flag, lr(f"{a}.vision_v_bridge_on_language"),
                     lr(f"{a}.vision_v_bridge_on_vision"))

        # clone-and-add K bridging BEFORE rope (reference order)
        k_for_vis = k.clone()
        k_for_vis[~flag] = k_for_vis[~flag] + kb[~flag]
        k_for_lang = k.clone()
        k_for_lang[flag] = k_for_lang[flag] + kb[flag]

        def heads(x):
            return x.view(B, N, H, hd).transpose(1, 2)

        def rope(x):
            return x * cos + _rot_half(x) * sin

        qh, vh = rope(heads(q)), heads(v)
        kv_h, kl_h = rope(heads(k_for_vis)), rope(heads(k_for_lang))
        vbh = heads(vb)

        scale = 1.0 / math.sqrt(hd)
        s_v = torch.matmul(qh, kv_h.transpose(2, 3)) * scale
        s_l = torch.matmul(qh, kl_h.transpose(2, 3)) * scale
        s = torch.where(flag[:, None, :, None], s_v, s_l)
        s = s + bias
        s = torch.max(s, torch.tensor(torch.finfo(s.dtype).min))
        att = F.softmax(s.float(), dim=-1).to(qh.dtype)

        # per-batch clone/scatter (flag differs per row): use masked adds
        fk = flag[:, None, :, None]
        v_vis = vh + torch.where(~fk, vbh, torch.zeros(()))
        v_lang = vh + torch.where(fk, vbh, torch.zeros(()))
        out_v = torch.matmul(att, v_vis)
        out_l = torch.matmul(att, v_lang)
        out = torch.where(flag[:, None, :, None], out_v, out_l)
        out = out.transpose(1, 2).reshape(B, N, D)
        attn_out = _routed(out, flag, lin(f"{a}.o_proj.weight"),
                           lr(f"{a}.vision_o_proj"))
        h = h + attn_out

        m = f"{pre}.mlp"
        hn2 = _routed(h, flag,
                      lambda x: _rms(x, sd[f"{pre}.post_attention_layernorm.weight"], eps),
                      lambda x: _rms(x, sd[f"{pre}.vision_post_attention_layernorm.weight"], eps))
        lang_mlp = lambda x: F.linear(
            F.silu(F.linear(x, sd[f"{m}.gate_proj.weight"]))
            * F.linear(x, sd[f"{m}.up_proj.weight"]), sd[f"{m}.down_proj.weight"])
        vis_mlp = lambda x: lr(f"{m}.vision_down_proj")(
            F.silu(lr(f"{m}.vision_gate_proj")(x)) * lr(f"{m}.vision_up_proj")(x))
        h = h + _routed(hn2, flag, lang_mlp, vis_mlp)

    h = _routed(h, flag,
                lambda x: _rms(x, sd["model.norm.weight"], eps),
                lambda x: _rms(x, sd["model.vision_norm.weight"], eps))
    text_logits = F.linear(h, sd["lm_head.weight"]).float()
    vis_logits = torch.stack(
        [F.linear(h, sd[f"vision_lm_head.heads.{q}.weight"]).float()
         for q in range(Q)])
    return text_logits.numpy(), vis_logits.numpy()


# ---------------------------------------------------------------------------
# LPIPS oracle (reference: taming/modules/losses/lpips.py)
# ---------------------------------------------------------------------------

_VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_VGG16_POOL_IDX = (4, 9, 16, 23)
_LPIPS_TAPS = (3, 8, 15, 22, 29)  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_LPIPS_CHANNELS = (64, 128, 256, 512, 512)


def make_lpips_state_dict(seed=0) -> Dict[str, torch.Tensor]:
    """Random torchvision-VGG16 + vgg_lpips-lin-head-named state dict."""
    g = torch.Generator().manual_seed(seed)
    sd = {}
    cin = 3
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
    conv_iter = iter(_VGG16_CONV_IDX)
    for c in cfg:
        if c == "M":
            continue
        i = next(conv_iter)
        sd[f"features.{i}.weight"] = torch.randn(c, cin, 3, 3, generator=g) \
            * (9 * cin) ** -0.5
        sd[f"features.{i}.bias"] = torch.randn(c, generator=g) * 0.05
        cin = c
    for k, c in enumerate(_LPIPS_CHANNELS):
        sd[f"lin{k}.model.1.weight"] = torch.rand(1, c, 1, 1, generator=g) * 0.2
    return sd


def _vgg16_taps(sd, x):
    """x NCHW through the VGG16 feature stack, returning the 5 LPIPS taps."""
    h = x
    feats = []
    for i in range(30):
        if i in _VGG16_CONV_IDX:
            h = F.conv2d(h, sd[f"features.{i}.weight"],
                         sd[f"features.{i}.bias"], padding=1)
        elif i in _VGG16_POOL_IDX:
            h = F.max_pool2d(h, 2)
        else:
            h = F.relu(h)
        if i in _LPIPS_TAPS:
            feats.append(h)
    return feats


def lpips_reference(sd: Dict[str, torch.Tensor], x: np.ndarray,
                    y: np.ndarray) -> float:
    """The reference LPIPS.forward on NCHW float inputs in [-1, 1]
    (lpips.py:41-54: scaling layer, VGG taps, channel-unit-normalize,
    squared diff, 1x1 lin heads, spatial average, sum over taps), batch
    mean."""
    shift = torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None]
    scale = torch.tensor([0.458, 0.448, 0.450])[None, :, None, None]
    with torch.no_grad():
        tx = (torch.from_numpy(x).float() - shift) / scale
        ty = (torch.from_numpy(y).float() - shift) / scale
        fx, fy = _vgg16_taps(sd, tx), _vgg16_taps(sd, ty)
        val = 0.0
        for k, (a, b) in enumerate(zip(fx, fy)):
            na = a / (a.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            nb = b / (b.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            d = (na - nb) ** 2
            r = F.conv2d(d, sd[f"lin{k}.model.1.weight"])
            val = val + r.mean([2, 3], keepdim=True)
        return float(val.mean())
