"""Modality-routed dual-path projections, the TPU-native way.

The reference routes tokens through language/vision modules with boolean-mask
gather/scatter (`cal_language_vision`, reference: modeling_libra.py:111-147)
-- dynamic shapes that XLA cannot tile. Here we compute BOTH paths densely for
all tokens and select with `jnp.where(vision_flag)`. This is numerically
identical (each output element comes from exactly one path) and fully static.

Cost note: the vision path is a down_ratio-4 bottleneck (LibraLinear,
reference: modeling_libra.py:150-204), so dense dual-path costs +25% FLOPs on
projections only; attention/matmul FLOPs are unchanged, and everything stays
on the MXU with no host-visible gathers.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def select_by_flag(flag: jax.Array, vision: jax.Array, language: jax.Array) -> jax.Array:
    """out[t] = vision[t] if flag[t] else language[t], broadcasting flag over
    trailing feature dims."""
    extra = vision.ndim - flag.ndim
    f = flag.reshape(flag.shape + (1,) * extra)
    return jnp.where(f, vision, language)


def apply_dropout(rng: Optional[jax.Array], x: jax.Array,
                  rate: float) -> jax.Array:
    """Inverted (train-time scaled) dropout, torch nn.Dropout semantics.
    Identity when rate == 0 or rng is None (eval)."""
    if rng is None or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def routed_dropout(rng: Optional[jax.Array], x: jax.Array, flag: jax.Array,
                   rate_vis: float, rate_lang: float) -> jax.Array:
    """Per-position modality-routed dropout: vision positions drop at
    rate_vis, language positions at rate_lang. Equivalent to the reference's
    per-path nn.Dropout before the scatter-merge (each position takes
    exactly one path in select mode)."""
    if rng is None or (rate_vis == 0.0 and rate_lang == 0.0):
        return x
    extra = x.ndim - flag.ndim
    f = flag.reshape(flag.shape + (1,) * extra)
    keep_p = jnp.where(f, 1.0 - rate_vis, 1.0 - rate_lang)
    u = jax.random.uniform(rng, x.shape)
    keep = u < keep_p
    return jnp.where(keep, x / keep_p.astype(x.dtype), jnp.zeros_like(x))


def gather_rows(x: jax.Array, src: jax.Array) -> jax.Array:
    """x (B, N, ...), src (B, T) int -> (B, T, ...): per-batch row gather."""
    idx = src.reshape(src.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, idx, axis=1)


def split_merge(flag: jax.Array, vis: jax.Array, lang_rows: jax.Array,
                inv: jax.Array) -> jax.Array:
    """Merge a dense vision output (B, N, F) with language outputs computed
    only on the T gathered text rows (B, T, F): broadcast the text rows back
    to full width via the inverse row map `inv` (B, N; clipped junk at
    vision positions) and select by flag. A gather-merge, not a scatter --
    row gathers lower to fast dynamic-gathers on TPU while row scatters can
    serialise."""
    return select_by_flag(flag, vis, gather_rows(lang_rows, inv))


def low_rank_linear(x: jax.Array, wa: jax.Array, wb: jax.Array) -> jax.Array:
    """Factored linear y = (x @ wa) @ wb.

    Mirrors LibraLinear.forward (reference: modeling_libra.py:192-199) with
    weights stored transposed for x @ W convention:
    wa: (in, bottleneck), wb: (bottleneck, out).
    """
    from libra_tpu.ops.qlinear import qdot
    return qdot(qdot(x, wa), wb)


def routed_linear(x: jax.Array, flag: jax.Array, w_lang: jax.Array,
                  wa_vis: jax.Array, wb_vis: jax.Array,
                  addition_mode: bool = False,
                  dropout: Optional[tuple] = None,
                  text_span: Optional[tuple] = None) -> jax.Array:
    """Dense routed projection.

    Language path: full-rank x @ w_lang. Vision path: low-rank (x@wa)@wb.
    addition_mode adds the vision output on top of the language output at
    vision positions instead of replacing it
    (reference: modeling_libra.py:111-127).

    dropout: optional (rng, rate_lang, rate_vis) applied per path BEFORE the
    merge -- in addition_mode the two summed terms get independent masks,
    matching the reference's [o_proj, resid_drop] / [vision_o_proj,
    vision_resid_drop] module lists (modeling_libra.py:409).

    text_span: optional (src (B, T), inv (B, N)) modality-split prefill maps
    (see models/libra.py::text_span_maps). When given (and not
    addition_mode, no active dropout), the EXPENSIVE full-rank language dot
    runs only on the T gathered text rows instead of all N -- exact, since
    language outputs at vision positions are discarded by the merge anyway.
    With a fixed 578-token image in a 610-token prompt this removes 95% of
    the language-path prefill FLOPs; T is static (N - 578), so shapes stay
    XLA-friendly.
    """
    from libra_tpu.ops.qlinear import qdot
    if text_span is not None and not addition_mode and (
            dropout is None or dropout[0] is None
            or (dropout[1] == 0.0 and dropout[2] == 0.0)):
        src, inv = text_span
        vis = low_rank_linear(x, wa_vis, wb_vis)
        lang_rows = qdot(gather_rows(x, src), w_lang)
        return split_merge(flag, vis, lang_rows, inv)
    lang = qdot(x, w_lang)
    vis = low_rank_linear(x, wa_vis, wb_vis)
    if dropout is not None:
        rng, rate_lang, rate_vis = dropout
        if rng is not None and (rate_lang > 0.0 or rate_vis > 0.0):
            rl, rv = jax.random.split(rng)
            lang = apply_dropout(rl, lang, rate_lang)
            vis = apply_dropout(rv, vis, rate_vis)
    if addition_mode:
        return lang + select_by_flag(flag, vis, jnp.zeros_like(vis))
    return select_by_flag(flag, vis, lang)


def routed_low_rank(x: jax.Array, flag: jax.Array,
                    wa_lang: jax.Array, wb_lang: jax.Array,
                    wa_vis: jax.Array, wb_vis: jax.Array) -> jax.Array:
    """Routed projection where both paths are low-rank (the K/V bridges:
    vision_*_bridge_on_language vs vision_*_bridge_on_vision,
    reference: modeling_libra.py:259-263,318-319)."""
    lang = low_rank_linear(x, wa_lang, wb_lang)
    vis = low_rank_linear(x, wa_vis, wb_vis)
    return select_by_flag(flag, vis, lang)
