"""Ground-truth parity for the vision stack against the ACTUAL reference
taming modules (LFQ quantizer and conv decoder), mirroring
test_reference_parity.py's approach for the decoder. Skips without the
reference checkout."""

import os

import numpy as np
import pytest

from tests.ref_compat import REF, ensure_reference_importable

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "libra")),
    reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref_path():
    ensure_reference_importable()
    return REF


def test_lfq_matches_reference(ref_path):
    """Sign-quantize + bit-pack indices + code reconstruction parity with
    the reference LFQ (lookup_free_quantization.py:52-280)."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from libra.models.libra.taming.modules.quantization.lookup_free_quantization import LFQ

    from libra_tpu.models import lfq as our_lfq
    from libra_tpu.models.vqgan import lfq_spec
    from libra_tpu.config import VQGANConfig

    cs, Q = 16, 2
    dim = Q * 4                          # log2(16)=4 bits per codebook
    ref = LFQ(dim=dim, codebook_size=cs, num_codebooks=Q,
              entropy_loss_weight=0.1, commitment_loss_weight=1.0,
              diversity_gamma=2.5).eval()

    x = np.random.RandomState(0).randn(2, dim, 3, 3).astype(np.float32)
    with torch.no_grad():
        quant_t, _, idx_t = ref(torch.from_numpy(x))
    # reference: (B, C, H, W) channel-first; indices (B, H, W, Q)

    cfg = VQGANConfig.tiny(embed_dim=dim, codebook_size=cs, num_codebook=Q,
                           z_channels=dim)
    spec = lfq_spec(cfg)
    out = our_lfq.quantize(jnp.asarray(x.transpose(0, 2, 3, 1)), spec,
                           training=False)
    np.testing.assert_array_equal(np.asarray(out.indices), idx_t.numpy())
    np.testing.assert_allclose(
        np.asarray(out.quantized),
        quant_t.numpy().transpose(0, 2, 3, 1), rtol=1e-6, atol=1e-6)

    # indices -> codes roundtrip
    with torch.no_grad():
        codes_t = ref.indices_to_codes(idx_t, project_out=True)
    codes_ours = our_lfq.indices_to_codes(out.indices, spec)
    np.testing.assert_allclose(np.asarray(codes_ours),
                               codes_t.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-6, atol=1e-6)


def test_conv_decoder_matches_reference(ref_path):
    """post_quant_conv + taming Decoder (incl. the fractional final
    upsample, model.py:538-543) parity through our weight converter."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    from libra.models.libra.taming.modules.diffusionmodules.model import Decoder

    from libra_tpu import checkpoint as ckpt
    from libra_tpu.config import VQGANConfig
    from libra_tpu.models import vqgan as vq
    from libra_tpu.ops.conv import conv2d

    # taming's Normalize is GroupNorm(32): all channel counts >= 32
    cfg = VQGANConfig.tiny(resolution=28, initial_resolution=2,
                           ch=32, ch_mult=(1, 2), num_res_blocks=1,
                           attn_resolutions=(2,), attn_num_heads=2,
                           norm_first=True, z_channels=32, embed_dim=8)
    torch.manual_seed(0)
    dec_t = Decoder(ch=cfg.ch, out_ch=cfg.out_ch, ch_mult=cfg.ch_mult,
                    num_res_blocks=cfg.num_res_blocks,
                    attn_resolutions=list(cfg.attn_resolutions),
                    in_channels=cfg.z_channels, resolution=cfg.resolution,
                    z_channels=cfg.z_channels,
                    initial_resolution=cfg.initial_resolution,
                    num_attn_head=cfg.attn_num_heads,
                    norm_first=cfg.norm_first).eval()
    pq_t = torch.nn.Conv2d(cfg.embed_dim, cfg.z_channels, 1)
    q_t = torch.nn.Conv2d(cfg.z_channels, cfg.embed_dim, 1)

    sd = {f"decoder.{k}": v.numpy() for k, v in dec_t.state_dict().items()}
    sd |= {f"post_quant_conv.{k}": v.numpy()
           for k, v in pq_t.state_dict().items()}
    sd |= {f"quant_conv.{k}": v.numpy() for k, v in q_t.state_dict().items()}
    params = ckpt.convert_vqgan_state_dict(sd, cfg)

    z = np.random.RandomState(1).randn(
        2, cfg.embed_dim, cfg.initial_resolution,
        cfg.initial_resolution).astype(np.float32)
    with torch.no_grad():
        want = dec_t(pq_t(torch.from_numpy(z))).numpy()

    @jax.jit
    def ours(params, z_nhwc):
        h = conv2d(z_nhwc, **params["post_quant_conv"])
        return vq.decoder_forward(params["decoder"], cfg, h)

    got = np.asarray(ours(params, jnp.asarray(z.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               rtol=2e-4, atol=2e-4)


def test_conversation_templates_match_reference(ref_path):
    """Prompt strings from every separator style match the reference
    conversation templates (libra/data/datasets/conversation.py)."""
    import importlib
    ref_conv = importlib.import_module("libra.data.datasets.conversation")
    from libra_tpu.data import conversation as our_conv

    msgs = [("USER", "<image>\nwhat is this?"),
            ("ASSISTANT", "A cat."),
            ("USER", "Are you sure?")]
    common = set(our_conv.conv_templates) & set(ref_conv.conv_templates)
    assert set(ref_conv.conv_templates) <= common   # full coverage
    for name in sorted(common):
        ref_c = ref_conv.conv_templates[name].copy()
        our_c = our_conv.conv_templates[name].copy()
        use = msgs[:1] if "plain" in name else msgs   # PLAIN: sep2 is None
        for i, (_, text) in enumerate(use):
            ref_c.append_message(ref_c.roles[i % 2], text)
            our_c.append_message(our_c.roles[i % 2], text)
        ref_c.append_message(ref_c.roles[1], None)
        our_c.append_message(our_c.roles[1], None)
        assert our_c.get_prompt() == ref_c.get_prompt(), name


def test_conversation_tuple_message_mmtag_parity(ref_path):
    """Tuple (image-carrying) first messages: the mmtag image preamble and
    the <image>\\n prepend match the reference renderer byte-for-byte
    (libra/data/datasets/conversation.py:30-40)."""
    import importlib
    ref_conv = importlib.import_module("libra.data.datasets.conversation")
    from libra_tpu.data import conversation as our_conv

    first = ("what is shown <image> here?", "<fake image>", "Default")
    follow = [("assistant", "A cat."), ("user", "Are you sure?"),
              ("assistant", None)]
    for name in sorted(set(ref_conv.conv_templates)):
        if "plain" in name:
            continue   # PLAIN renders no roles; tuple path is chat-only
        ref_c = ref_conv.conv_templates[name].copy()
        our_c = our_conv.conv_templates[name].copy()
        ref_c.append_message(ref_c.roles[0], first)
        our_c.append_message(our_c.roles[0], first)
        for i, (_, text) in enumerate(follow):
            ref_c.append_message(ref_c.roles[(i + 1) % 2], text)
            our_c.append_message(our_c.roles[(i + 1) % 2], text)
        assert our_c.get_prompt() == ref_c.get_prompt(), name


def test_conv_encoder_matches_reference(ref_path):
    """taming conv Encoder parity through convert_vqgan_encoder (the
    non-CLIP tokenizer variant, model.py:380-471)."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    from libra.models.libra.taming.modules.diffusionmodules.model import Encoder

    from libra_tpu import checkpoint as ckpt
    from libra_tpu.config import VQGANConfig
    from libra_tpu.models import vqgan as vq

    cfg = VQGANConfig.tiny(resolution=16, initial_resolution=4,
                           ch=32, ch_mult=(1, 2), num_res_blocks=1,
                           attn_resolutions=(8,), z_channels=32, embed_dim=8,
                           encoder_name="conv")
    torch.manual_seed(3)
    enc_t = Encoder(ch=cfg.ch, out_ch=cfg.out_ch, ch_mult=cfg.ch_mult,
                    num_res_blocks=cfg.num_res_blocks,
                    attn_resolutions=list(cfg.attn_resolutions),
                    in_channels=3, resolution=cfg.resolution,
                    z_channels=cfg.z_channels, double_z=False).eval()
    sd = {f"encoder.{k}": v.numpy() for k, v in enc_t.state_dict().items()}
    params = {"encoder": jax.tree_util.tree_map(
        jnp.asarray, ckpt.convert_vqgan_encoder(sd, cfg))}

    x = np.random.RandomState(4).randn(2, 16, 16, 3).astype(np.float32)
    with torch.no_grad():
        want = enc_t(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(jax.jit(
        lambda p, x: vq.encoder_forward(p["encoder"], cfg, x))(params,
                                                               jnp.asarray(x)))
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               rtol=2e-4, atol=2e-4)


def _fast_tokenizer():
    """Tiny HF fast tokenizer (offsets-capable) shared by both sides."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    # ByteLevel keeps newlines/spaces inside tokens so char_to_token
    # resolves at separator positions (like the real LLaMA tokenizer)
    t = Tokenizer(models.WordLevel(vocab={"<unk>": 0}, unk_token="<unk>"))
    t.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    return PreTrainedTokenizerFast(tokenizer_object=t, unk_token="<unk>")


def test_instruction_v1_label_spans_match_reference(ref_path):
    """Per-round user-turn mask spans (char_to_token) parity with the
    reference preprocess_v1 (instruction_dataset.py:262-326) -- SURVEY
    'hard part': the fiddly label-mask construction."""
    import types
    pytest.importorskip("tokenizers")
    from libra.data.datasets.instruction_dataset import LazySupervisedDataset as InstructionDataset
    from libra.data.datasets import conversation as ref_conv

    from libra_tpu.data.instruction import InstructionDataset as Ours
    from libra_tpu.data import conversation as our_conv

    hf = _fast_tokenizer()
    num_img = 4
    ph = (" <img_ph>" * num_img).strip()
    source = [
        {"from": "human", "value": ph + "\nwhat is in the image?"},
        {"from": "gpt", "value": "A small cat."},
        {"from": "human", "value": "are you sure about that?"},
        {"from": "gpt", "value": "Yes, quite sure."},
    ]

    ref_self = types.SimpleNamespace(
        tokenizer=hf, conversation=ref_conv.conv_templates["v1"].copy(),
        num_img_tokens=num_img, modeling_image=True)
    want_text, want_spans = InstructionDataset.preprocess_v1(
        ref_self, [source])

    our_self = types.SimpleNamespace(
        tokenizer=types.SimpleNamespace(encode_with_spans=lambda s: hf(s)),
        conversation=our_conv.conv_templates["v1"].copy(),
        num_img_tokens=num_img, modeling_image=True)
    got_text, got_spans = Ours._preprocess_v1(our_self, source)

    assert got_text == want_text
    assert [tuple(s) for s in got_spans] == [tuple(s) for s in want_spans]

    # text-only source (no image placeholders)
    src2 = [{"from": "human", "value": "hello there"},
            {"from": "gpt", "value": "General greeting."}]
    want = InstructionDataset.preprocess_v1(ref_self, [src2])
    got = Ours._preprocess_v1(our_self, src2)
    assert got[0] == want[0]
    assert [tuple(s) for s in got[1]] == [tuple(s) for s in want[1]]


def test_laion_caption_spans_match_reference(ref_path):
    """LAION caption assembly + label-mask spans parity with
    LaionDataset.process_caption (laion_dataset.py:178-241), both i2t
    (image=background) and t2i (image=respond) directions."""
    import types
    pytest.importorskip("tokenizers")
    from libra.data.datasets.laion_dataset import LaionDataset

    from libra_tpu.data.caption_format import build_caption, label_mask_spans

    hf = _fast_tokenizer()
    ph = ("<img_ph> " * 4).strip()
    ref_self = types.SimpleNamespace(tokenizer=hf, add_newline_sep=False)
    hf.add_eos_token = False

    cases = [
        dict(background=ph, respond="a cute dog on grass",
             instuction="describe the image", img_type="background"),
        dict(background=ph, respond="a cute dog on grass",
             instuction="", img_type="background"),
        dict(background="a cute dog on grass", respond=ph,
             instuction="", img_type="respond"),
        dict(background="a cute dog on grass", respond=ph,
             instuction="draw this", img_type="respond"),
    ]
    for strategy in ("prompt", "instruction", "none"):
        for case in cases:
            want_cap, want_spans = LaionDataset.process_caption(
                ref_self, label_mask_strategy=strategy, **case)
            got_cap, instruction_ = build_caption(
                case["background"], case["respond"], case["instuction"],
                case["img_type"])
            tok = types.SimpleNamespace(
                encode_with_spans=lambda s: hf(s, return_length=True),
                add_eos_token=False)
            got_spans = label_mask_spans(
                tok, got_cap, case["background"].strip(), instruction_,
                case["img_type"], label_mask_strategy=strategy)
            assert got_cap == want_cap, (strategy, case)
            assert ([tuple(s) for s in got_spans]
                    == [tuple(s) for s in want_spans]), (strategy, case)
