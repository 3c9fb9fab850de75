"""Logit-level parity against the ACTUAL reference implementation.

Imports the real `modeling_libra.py` from /root/reference (CPU torch),
builds a tiny reference model, converts its state_dict with
libra_tpu.checkpoint, and compares combined-vocab logits position by
position. This validates both the model math and the checkpoint name
mapping against the ground truth rather than against our own oracle.

Skipped automatically when /root/reference is not mounted (CI portability).
"""

import os

import numpy as np
import pytest

from tests.ref_compat import REF, ensure_reference_importable

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "libra")),
    reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref_modeling():
    ensure_reference_importable()
    from libra.models.libra import modeling_libra, configuration_libra
    return modeling_libra, configuration_libra


def _ref_cfg_from(configuration, cfg):
    return configuration.LibraConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        vision_vocab_size=cfg.vision_vocab_size,
        vision_codebook_num=cfg.vision_codebook_num,
        max_vision_token_length=cfg.max_vision_token_length,
        image_feature_resolution=cfg.image_feature_resolution,
        contiguous_signal_size=cfg.contiguous_signal_size,
        bridge_rank=cfg.bridge_rank,
        vision_down_ratio=cfg.vision_down_ratio,
        rms_norm_eps=cfg.rms_norm_eps,
        vision_prediction_mode=cfg.vision_prediction_mode,
        use_bridge=cfg.use_bridge,
        concat_signals=cfg.concat_signals,
        norm_signals=cfg.norm_signals,
        addition_mode=cfg.addition_mode,
        use_vision_position_embedding=cfg.use_vision_position_embedding,
        unified_head=cfg.unified_head,
        use_2d_rope=cfg.use_2d_rope)


@pytest.mark.parametrize("variant", [
    {},
    {"addition_mode": True},
    {"concat_signals": False},
    {"norm_signals": False},
    {"use_vision_position_embedding": True},
    {"use_2d_rope": True},
    {"vision_prediction_mode": "2d"},
    {"use_bridge": False},
])
def test_logits_match_reference(ref_modeling, variant):
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from libra_tpu import checkpoint as ckpt
    from libra_tpu.config import LibraConfig
    from libra_tpu.models import libra as M
    from tests.test_core_model import make_inputs

    modeling, configuration = ref_modeling
    cfg = LibraConfig.tiny(**variant)
    ref_cfg = _ref_cfg_from(configuration, cfg)
    for flag in ("use_bridge", "concat_signals", "norm_signals",
                 "addition_mode", "unified_head", "use_2d_rope",
                 "vision_prediction_mode", "use_vision_position_embedding"):
        assert getattr(ref_cfg, flag) == getattr(cfg, flag), flag

    torch.manual_seed(0)
    ref = modeling.LibraForCausalLM(ref_cfg).float().eval()
    sd = {k: v.float().numpy() for k, v in ref.state_dict().items()}
    params = ckpt.convert_libra_state_dict(sd, cfg)

    ids, mask, vi, sig = make_inputs(cfg, B=2)
    ids_n, mask_n = np.asarray(ids), np.asarray(mask)
    vi_n, sig_n = np.asarray(vi), np.asarray(sig, np.float32)

    with torch.no_grad():
        out = ref(input_ids=torch.from_numpy(ids_n).long(),
                  attention_mask=torch.from_numpy(mask_n).long(),
                  vision_indices=torch.from_numpy(vi_n).long(),
                  contiguous_signal=torch.from_numpy(sig_n),
                  use_cache=False)
    want = out.logits.numpy()            # (Q, B, N, V + Vv) with -inf slices

    @jax.jit
    def ours(params, ids, mask, vi, sig):
        o = M.forward(params, cfg, ids, mask, vi, sig)
        flag = vi < cfg.max_vision_token_length
        tl = M.compute_text_logits(params, o.hidden_states)
        if cfg.vision_prediction_mode == "2d":
            vl = M.compute_vision_logits_2d(params, cfg, o.hidden_states, vi)
        else:
            vl = M.compute_vision_logits(params, o.hidden_states)
        return M.assemble_logits(cfg, tl, vl, flag)

    got = np.asarray(ours(params, ids, mask, vi, sig))
    assert got.shape == want.shape

    # identical -inf placeholder pattern, matching finite values; compare
    # only non-pad positions (pad queries are garbage on both sides but not
    # numerically identical)
    valid = mask_n.astype(bool)[None, :, :, None]
    valid = np.broadcast_to(valid, want.shape)
    finite = np.isfinite(want)
    np.testing.assert_array_equal(finite | ~valid, np.isfinite(got) | ~valid)
    sel = finite & valid
    np.testing.assert_allclose(got[sel], want[sel], rtol=2e-4, atol=2e-4)


def test_loss_matches_reference(ref_modeling):
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from libra_tpu import checkpoint as ckpt
    from libra_tpu.config import LibraConfig
    from libra_tpu.models import libra as M
    from tests.test_core_model import make_inputs

    modeling, configuration = ref_modeling
    cfg = LibraConfig.tiny()
    ref_cfg = _ref_cfg_from(configuration, cfg)
    torch.manual_seed(1)
    ref = modeling.LibraForCausalLM(ref_cfg).float().eval()
    sd = {k: v.float().numpy() for k, v in ref.state_dict().items()}
    params = ckpt.convert_libra_state_dict(sd, cfg)

    ids, mask, vi, sig = make_inputs(cfg, B=2)
    ids_n, mask_n = np.asarray(ids), np.asarray(mask)
    vi_n, sig_n = np.asarray(vi), np.asarray(sig, np.float32)
    flag_n = vi_n < cfg.max_vision_token_length

    # labels: ignore pads and modality-mismatched targets (the data layer
    # guarantees this; the reference would emit -inf there)
    labels = np.where(mask_n[None].astype(bool), ids_n, -100)
    is_text_label = labels < cfg.vocab_size
    shift_bad = np.zeros_like(labels, bool)
    shift_bad[:, :, 1:] = flag_n[None, :, :-1] == is_text_label[:, :, 1:]
    labels = np.where(shift_bad, -100, labels)

    with torch.no_grad():
        out = ref(input_ids=torch.from_numpy(ids_n).long(),
                  attention_mask=torch.from_numpy(mask_n).long(),
                  vision_indices=torch.from_numpy(vi_n).long(),
                  contiguous_signal=torch.from_numpy(sig_n),
                  labels=torch.from_numpy(labels).long(),
                  use_cache=False)
    want = float(out.loss)

    @jax.jit
    def loss(params, ids, mask, vi, sig, labels):
        o = M.forward(params, cfg, ids, mask, vi, sig)
        flag = vi < cfg.max_vision_token_length
        tl = M.compute_text_logits(params, o.hidden_states)
        vl = M.compute_vision_logits(params, o.hidden_states)
        return M.multicodebook_loss(cfg, tl, vl, flag, labels,
                                    unified=cfg.unified_head)

    got = float(loss(params, ids, mask, vi, sig, jnp.asarray(labels)))
    assert abs(got - want) < 2e-4 * max(1.0, abs(want)), (got, want)


def test_cached_decode_matches_reference(ref_modeling):
    """Bridged KV-cache parity (SURVEY 'hard part #1'): prefill + cached
    single-token step against the reference's past_key_values path."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from libra_tpu import checkpoint as ckpt
    from libra_tpu.config import LibraConfig
    from libra_tpu.models import libra as M
    from tests.test_core_model import make_inputs

    modeling, configuration = ref_modeling
    cfg = LibraConfig.tiny()
    ref_cfg = _ref_cfg_from(configuration, cfg)
    torch.manual_seed(2)
    ref = modeling.LibraForCausalLM(ref_cfg).float().eval()
    sd = {k: v.float().numpy() for k, v in ref.state_dict().items()}
    params = ckpt.convert_libra_state_dict(sd, cfg)

    ids, mask, vi, sig = make_inputs(cfg, B=2)
    Q, B, N = ids.shape
    ids_n, mask_n = np.asarray(ids), np.asarray(mask)
    vi_n, sig_n = np.asarray(vi), np.asarray(sig, np.float32)

    pos_full = np.asarray(M.position_ids_from_mask(mask))
    t = lambda x: torch.from_numpy(np.ascontiguousarray(x))

    with torch.no_grad():
        pre = ref(input_ids=t(ids_n[:, :, :N - 1]).long(),
                  attention_mask=t(mask_n[:, :N - 1]).long(),
                  position_ids=t(pos_full[:, :N - 1]).long(),
                  vision_indices=t(vi_n[:, :N - 1]).long(),
                  contiguous_signal=t(sig_n[:, :N - 1]),
                  use_cache=True)
        step = ref(input_ids=t(ids_n[:, :, N - 1:]).long(),
                   attention_mask=t(mask_n).long(),
                   position_ids=t(pos_full[:, N - 1:]).long(),
                   vision_indices=t(vi_n[:, N - 1:]).long(),
                   past_key_values=pre.past_key_values,
                   use_cache=True)
    want = step.logits.numpy()[:, :, -1]        # (Q, B, V+Vv)

    @jax.jit
    def ours(params, ids, mask, vi, sig):
        cache = M.init_cache(cfg, B, N, dtype=jnp.float32)
        mask_buf = jnp.zeros((B, N), jnp.int32).at[:, :N - 1].set(
            mask[:, :N - 1])
        pre = M.forward(params, cfg, ids[:, :, :N - 1], mask_buf,
                        vi[:, :N - 1], sig[:, :N - 1],
                        position_ids=jnp.asarray(pos_full[:, :N - 1]),
                        cache=cache)
        mask_buf = mask_buf.at[:, N - 1].set(mask[:, N - 1])
        st = M.forward(params, cfg, ids[:, :, N - 1:], mask_buf,
                       vi[:, N - 1:], None,
                       position_ids=jnp.asarray(pos_full[:, N - 1:]),
                       cache=pre.cache)
        flag = (vi[:, N - 1:] < cfg.max_vision_token_length)
        tl = M.compute_text_logits(params, st.hidden_states)
        vl = M.compute_vision_logits(params, st.hidden_states)
        return M.assemble_logits(cfg, tl, vl, flag)[:, :, -1]

    got = np.asarray(ours(params, ids, mask, vi, sig))
    finite = np.isfinite(want)
    np.testing.assert_array_equal(finite, np.isfinite(got))
    np.testing.assert_allclose(got[finite], want[finite],
                               rtol=2e-4, atol=2e-4)
