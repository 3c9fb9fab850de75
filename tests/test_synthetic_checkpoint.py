"""End-to-end loading of a synthetic checkpoint in the EXACT reference
on-disk layout (VERDICT r4 item 7: de-risk real-checkpoint loading without
a real checkpoint).

The directory mirrors README.md:53-83 at tiny scale:

    <ckpt>/
      config.json                              (reference LibraConfig json)
      pytorch_model-0000?-of-00002.bin         (sharded decoder weights)
      pytorch_model.bin.index.json             (or model-*.safetensors +
                                                model.safetensors.index.json)
      tokenizer.json / tokenizer_config.json   (fast text tokenizer)
      vision_tokenizer_config.yaml
      vqgan.ckpt                               (Lightning {"state_dict": ...})
      openai-clip-vit-large-patch14-336/       (nested CLIP dir, named by
        config.json + pytorch_model.bin         ddconfig.encoder_name)

Weights come from the ACTUAL reference torch modules (state_dict key names
and shapes are ground truth, not re-guessed here), written through the real
serialization formats, then loaded back through the one public entry point
`LibraPipeline.from_pretrained` and compared leaf-for-leaf against a direct
in-memory conversion. Skipped when /root/reference is absent.
"""

import json
import os

import numpy as np
import pytest

from tests.ref_compat import REF, ensure_reference_importable

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "libra")),
    reason="reference checkout not available")

torch = pytest.importorskip("torch")

YAML = """
max_vision_token_length: 6
freeze: true
params:
  embed_dim: 8
  codebook_size: 16
  num_codebook: 2
  ckpt_path: vqgan.ckpt
  ddconfig:
    encoder_name: openai-clip-vit-large-patch14-336
    select_layer: -2
    z_channels: 32
    resolution: 28
    initial_resolution: 2
    ch: 32
    ch_mult: [1, 2]
    num_res_blocks: 1
    attn_resolutions: [2]
    out_ch: 3
    dropout: 0.0
    norm_first: true
    num_attn_head: 2
"""


def _ref_decoder_sd(cfg):
    """State dict of the actual reference LibraForCausalLM at tiny scale."""
    ensure_reference_importable()
    from libra.models.libra import configuration_libra, modeling_libra
    from tests.test_reference_parity import _ref_cfg_from

    ref_cfg = _ref_cfg_from(configuration_libra, cfg)
    torch.manual_seed(0)
    ref = modeling_libra.LibraForCausalLM(ref_cfg).float().eval()
    return ref_cfg, ref.state_dict()


def _ref_vqgan_sd():
    """taming Decoder + quant convs named as a VQModel Lightning ckpt
    (the tiny shape of test_reference_vision_parity's decoder test)."""
    ensure_reference_importable()
    from libra.models.libra.taming.modules.diffusionmodules.model import \
        Decoder

    torch.manual_seed(1)
    dec = Decoder(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                  attn_resolutions=[2], in_channels=32, resolution=28,
                  z_channels=32, initial_resolution=2, num_attn_head=2,
                  norm_first=True).eval()
    # CLIP tap (hidden 32) -> LFQ dim 8 (2 codebooks x log2(16))
    q = torch.nn.Conv2d(32, 8, 1)
    pq = torch.nn.Conv2d(8, 32, 1)
    sd = {f"decoder.{k}": v for k, v in dec.state_dict().items()}
    sd |= {f"quant_conv.{k}": v for k, v in q.state_dict().items()}
    sd |= {f"post_quant_conv.{k}": v for k, v in pq.state_dict().items()}
    # tokenizer-training leftovers the loader must ignore (the reference
    # strips ignore_keys=["loss."], image_tokenizer.py:19)
    sd["loss.discriminator.main.0.weight"] = torch.zeros(4, 3, 3, 3)
    return sd


def _tiny_clip():
    """Installed-transformers CLIPVisionModel (state-dict layout identical
    to the reference's vendored copy) at the tiny geometry."""
    import transformers

    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14)
    torch.manual_seed(2)
    return hf_cfg, transformers.CLIPVisionModel(hf_cfg).eval()


def _tiny_tokenizer_files(d):
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    vocab |= {w: i + 3 for i, w in enumerate(
        ["a", "cat", "dog", "the", "what", "is"])}
    t = Tokenizer(models.WordLevel(vocab=vocab, unk_token="<unk>"))
    t.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok = PreTrainedTokenizerFast(tokenizer_object=t, unk_token="<unk>",
                                  bos_token="<s>", eos_token="</s>")
    tok.save_pretrained(str(d))


def _write_shards(d, sd, fmt):
    """Two weight shards + the index json, both serialization formats.
    fmt 'safetensors_shuffled' assigns keys to shards ROUND-ROBIN (VERDICT
    r4 item 8): real multi-shard indexes are not sorted contiguous splits,
    and the loader must follow weight_map rather than shard order."""
    keys = sorted(sd)
    if fmt == "safetensors_shuffled":
        split = {0: keys[0::2], 1: keys[1::2]}
    else:
        half = len(keys) // 2
        split = {0: keys[:half], 1: keys[half:]}
    shards = {i: {k: sd[k] for k in ks} for i, ks in split.items()}
    if fmt == "bin":
        names = [f"pytorch_model-0000{i + 1}-of-00002.bin" for i in range(2)]
        for i, name in enumerate(names):
            torch.save(shards[i], str(d / name))
        index_name = "pytorch_model.bin.index.json"
    else:
        from safetensors.torch import save_file
        names = [f"model-0000{i + 1}-of-00002.safetensors" for i in range(2)]
        for i, name in enumerate(names):
            save_file({k: v.bfloat16().contiguous()
                       for k, v in shards[i].items()}, str(d / name))
        index_name = "model.safetensors.index.json"
    weight_map = {k: names[i] for i, ks in split.items() for k in ks}
    (d / index_name).write_text(json.dumps(
        {"metadata": {"total_size": 0}, "weight_map": weight_map}))


@pytest.fixture(scope="module",
                params=["bin", "safetensors", "safetensors_shuffled"])
def synth_dir(request, tmp_path_factory):
    from libra_tpu.config import LibraConfig

    cfg = LibraConfig.tiny()
    d = tmp_path_factory.mktemp(f"ckpt_{request.param}")

    ref_cfg, sd = _ref_decoder_sd(cfg)
    ref_cfg.to_json_file(str(d / "config.json"))
    _write_shards(d, sd, request.param)
    _tiny_tokenizer_files(d)

    (d / "vision_tokenizer_config.yaml").write_text(YAML)
    torch.save({"state_dict": _ref_vqgan_sd(), "epoch": 3, "global_step": 0},
               str(d / "vqgan.ckpt"))

    clip_cfg, clip = _tiny_clip()
    cd = d / "openai-clip-vit-large-patch14-336"
    cd.mkdir()
    # the real openai/clip-vit-* config.json is a joint CLIPConfig with the
    # vision half nested under "vision_config" -- exercise that branch
    (cd / "config.json").write_text(json.dumps(
        {"model_type": "clip", "vision_config": clip_cfg.to_dict()}))
    torch.save(clip.state_dict(), str(cd / "pytorch_model.bin"))
    (cd / "preprocessor_config.json").write_text(json.dumps(
        {"image_processor_type": "CLIPImageProcessor", "crop_size": 28}))

    return d, cfg, sd, request.param


def test_pipeline_loads_reference_layout(synth_dir):
    import jax
    import jax.numpy as jnp

    from libra_tpu import checkpoint as ckpt
    from libra_tpu.pipeline import LibraPipeline

    d, cfg, sd, fmt = synth_dir
    pipe = LibraPipeline.from_pretrained(str(d))

    # config round-trips through the reference's own PretrainedConfig json
    for f in ("vocab_size", "hidden_size", "num_hidden_layers",
              "vision_vocab_size", "vision_codebook_num",
              "max_vision_token_length", "bridge_rank", "use_bridge",
              "concat_signals", "vision_prediction_mode"):
        assert getattr(pipe.cfg, f) == getattr(cfg, f), f

    # decoder params: the disk round-trip must equal a direct in-memory
    # conversion exactly (bf16 shards round through f32 identically on
    # both sides)
    if fmt.startswith("safetensors"):
        sd_np = {k: v.bfloat16().float().numpy() for k, v in sd.items()}
    else:
        sd_np = {k: v.float().numpy() for k, v in sd.items()}
    want = ckpt.convert_libra_state_dict(sd_np, pipe.cfg)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        pipe.params, want)

    # the nested-CLIP-dir weights landed in the vision tokenizer
    img_tok = pipe.tokenizer.image_tokenizer
    assert "clip" in img_tok.params
    assert img_tok.cfg.clip.hidden_size == 32
    assert img_tok.cfg.clip.image_size == 28
    assert img_tok.boi_token_id == cfg.vocab_size + 16
    assert img_tok.eoi_token_id == cfg.vocab_size + 17
    assert img_tok.max_vision_token_length == 6
    assert img_tok.downsample_ratio is None          # CLIP tap: fixed size

    # ... and the whole vision stack runs: encode ids + continuous signal
    px = jnp.asarray(np.random.RandomState(0)
                     .randn(1, 28, 28, 3).astype(np.float32))
    enc = img_tok.encode(px)
    ids = np.asarray(enc["input_ids"])
    assert ids.shape == (2, 1, 6)
    assert (ids[:, :, 0] == img_tok.boi_token_id).all()
    assert (ids[:, :, -1] == img_tok.eoi_token_id).all()
    codes = ids[:, :, 1:-1]
    assert ((codes >= cfg.vocab_size) & (codes < cfg.vocab_size + 16)).all()
    assert np.asarray(enc["encoder_feat"]).shape == (1, 4, 32)

    # text tokenizer carries the added special tokens (pad = unk)
    tt = pipe.tokenizer.text_tokenizer
    assert tt.img_ph_token_id is not None and tt.img_gen_token_id is not None
    assert tt.pad_token_id == tt.unk_token_id


def test_generate_from_synthetic_checkpoint(synth_dir):
    """One greedy decode through the loaded pipeline: the full
    tokenize -> prefill -> cached decode path runs on disk-loaded weights
    and matches the same Generator driven by in-memory-converted params."""
    import jax.numpy as jnp

    from libra_tpu import checkpoint as ckpt
    from libra_tpu.generation import GenerationConfig, Generator
    from libra_tpu.pipeline import LibraPipeline

    d, cfg, sd, fmt = synth_dir
    pipe = LibraPipeline.from_pretrained(str(d))

    # one <img_ph> per vision token (the reference expands <image> to
    # max_vision_token_length placeholders, instruction_dataset.py:206-225)
    ph = " ".join(["<img_ph>"] * 6)
    sample = {"language": f"what is {ph} a cat",
              "vision": [np.random.RandomState(1)
                         .randn(28, 28, 3).astype(np.float32)]}
    pipe.tokenizer.text_tokenizer.tok.padding_side = "left"
    inputs = pipe.tokenizer([sample])
    gen = GenerationConfig(max_new_tokens=4, eos_token_id=-1)
    res = pipe.generator(inputs, gen)

    sd_np = {k: (v.bfloat16().float() if fmt.startswith("safetensors")
                 else v.float()).numpy() for k, v in sd.items()}
    mem = Generator(ckpt.convert_libra_state_dict(sd_np, pipe.cfg), pipe.cfg)
    want = mem(inputs, gen)
    np.testing.assert_array_equal(np.asarray(res.sequences),
                                  np.asarray(want.sequences))


def _real_vocab_tokenizer_files(d):
    """A 32000-entry fast tokenizer -- the REAL LLaMA vocab size -- so the
    added-token / vision-offset arithmetic is exercised at the boundary the
    actual checkpoint ships (VERDICT r4 item 8). <img_ph>/<img_gen> are
    ADDED tokens and land at ids 32000/32001, numerically colliding with
    the first vision codes (offset 32000 + code) exactly as in the
    reference -- legal because placeholders are replaced by vision ids
    before the model ever sees them (tokenization_libra.py:250-266)."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    # byte-level pre-tokenization marks word-leading spaces with G-breve,
    # like the real LLaMA fast tokenizer's byte-level surface
    vocab |= {w: i + 3 for i, w in enumerate(
        ["what", "Ġis", "Ġa", "Ġcat", "Ġthe", "Ġdog"])}
    vocab |= {f"w{i}": i for i in range(9, 32000)}
    assert len(vocab) == 32000
    t = Tokenizer(models.WordLevel(vocab=vocab, unk_token="<unk>"))
    t.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    t.decoder = decoders.ByteLevel()
    tok = PreTrainedTokenizerFast(tokenizer_object=t, unk_token="<unk>",
                                  bos_token="<s>", eos_token="</s>")
    tok.save_pretrained(str(d))


@pytest.fixture(scope="module")
def synth_dir_real_vocab(tmp_path_factory):
    """The synthetic layout with the decoder at the REAL 32000-token text
    vocab (hidden stays tiny): vision offset 32000, BOI 32016, EOI 32017."""
    import dataclasses

    from libra_tpu.config import LibraConfig

    cfg = dataclasses.replace(LibraConfig.tiny(), vocab_size=32000)
    d = tmp_path_factory.mktemp("ckpt_real_vocab")
    ref_cfg, sd = _ref_decoder_sd(cfg)
    ref_cfg.to_json_file(str(d / "config.json"))
    _write_shards(d, sd, "bin")
    _real_vocab_tokenizer_files(d)
    (d / "vision_tokenizer_config.yaml").write_text(YAML)
    torch.save({"state_dict": _ref_vqgan_sd(), "epoch": 3, "global_step": 0},
               str(d / "vqgan.ckpt"))
    clip_cfg, clip = _tiny_clip()
    cd = d / "openai-clip-vit-large-patch14-336"
    cd.mkdir()
    (cd / "config.json").write_text(json.dumps(
        {"model_type": "clip", "vision_config": clip_cfg.to_dict()}))
    torch.save(clip.state_dict(), str(cd / "pytorch_model.bin"))
    (cd / "preprocessor_config.json").write_text(json.dumps(
        {"image_processor_type": "CLIPImageProcessor", "crop_size": 28}))
    return d, cfg


def test_real_vocab_tokenizer_boundaries(synth_dir_real_vocab):
    """Added-token ids, vision offsets and the joint tokenize at the real
    32000 vocab boundary."""
    from libra_tpu.pipeline import LibraPipeline

    d, cfg = synth_dir_real_vocab
    pipe = LibraPipeline.from_pretrained(str(d))

    tt = pipe.tokenizer.text_tokenizer
    assert tt.tok.vocab_size == 32000          # base vocab excludes added
    assert tt.img_ph_token_id == 32000
    assert tt.img_gen_token_id == 32001
    assert tt.pad_token_id == tt.unk_token_id == 0
    img_tok = pipe.tokenizer.image_tokenizer
    assert img_tok.offset == 32000
    assert img_tok.boi_token_id == 32016
    assert img_tok.eoi_token_id == 32017

    # joint tokenize: placeholder ids (32000) are REPLACED by vision ids in
    # [32000, 32016); BOI/EOI frame the block; text stays < 32000
    ph = " ".join(["<img_ph>"] * 6)
    sample = {"language": f"what is {ph} a cat",
              "vision": [np.random.RandomState(3)
                         .randn(28, 28, 3).astype(np.float32)]}
    out = pipe.tokenizer([sample])
    ids = np.asarray(out["input_ids"])         # (2, 1, N)
    vi = np.asarray(out["vision_indices"])[0]
    block = ids[:, 0, :][:, vi < 6]
    assert block.shape[-1] == 6
    assert (block[:, 0] == 32016).all() and (block[:, -1] == 32017).all()
    assert ((block[:, 1:-1] >= 32000) & (block[:, 1:-1] < 32016)).all()
    text = ids[0, 0][vi >= 6]
    assert (text < 32000).all()
    # vision rows of the combined-vocab stream decode back to text + image
    txt = pipe.tokenizer.decode(ids[:, 0])
    assert "what is" in txt["language"].lower()


def test_bf16_drift_bounds_width4096():
    """fp32 parity AND the bf16 round-trip drift bound at the REAL 4096
    hidden width (VERDICT r4 item 8: tiny-shape tests leave 4096-dim
    fp-accumulation unproven). One full-width decoder layer stack
    (hidden 4096, intermediate 11008, 32 heads, bridge rank 8, down
    ratio 4; vocab shrunk -- embeddings don't accumulate over width):

      * fp32-loaded JAX logits match torch fp32 to 5e-4 relative -- the
        4096-length dot accumulations agree, not just the 64-length ones;
      * bf16-shard-loaded logits drift from fp32-loaded by < 5% relative
        (documented bound for the safetensors-bf16 checkpoint path;
        measured 2.4% max-abs / mean-abs-logit on this seed -- weight
        rounding is 2^-9 relative per entry, amplified by the RMSNorm +
        softmax + 4096-length accumulation chain).
    """
    import dataclasses

    import jax

    from libra_tpu import checkpoint as ckpt
    from libra_tpu.config import LibraConfig
    from libra_tpu.models import libra as M
    from tests.test_core_model import make_inputs
    from tests.test_reference_parity import _ref_cfg_from

    ensure_reference_importable()
    from libra.models.libra import configuration_libra, modeling_libra

    cfg = dataclasses.replace(
        LibraConfig.tiny(), hidden_size=4096, intermediate_size=11008,
        num_attention_heads=32, num_hidden_layers=1, vocab_size=64,
        contiguous_signal_size=128)
    ref_cfg = _ref_cfg_from(configuration_libra, cfg)
    torch.manual_seed(4)
    ref = modeling_libra.LibraForCausalLM(ref_cfg).float().eval()
    sd32 = {k: v.float().numpy() for k, v in ref.state_dict().items()}
    sd16 = {k: v.bfloat16().float().numpy()
            for k, v in ref.state_dict().items()}

    ids, mask, vi, sig = make_inputs(cfg, B=1)

    with torch.no_grad():
        out = ref(input_ids=torch.from_numpy(np.asarray(ids)).long(),
                  attention_mask=torch.from_numpy(np.asarray(mask)).long(),
                  vision_indices=torch.from_numpy(np.asarray(vi)).long(),
                  contiguous_signal=torch.from_numpy(
                      np.asarray(sig, np.float32)),
                  use_cache=False)
    want = out.logits.numpy()

    @jax.jit
    def logits_of(params):
        o = M.forward(params, cfg, ids, mask, vi, sig)
        flag = vi < cfg.max_vision_token_length
        tl = M.compute_text_logits(params, o.hidden_states)
        vl = M.compute_vision_logits(params, o.hidden_states)
        return M.assemble_logits(cfg, tl, vl, flag)

    got32 = np.asarray(logits_of(ckpt.convert_libra_state_dict(sd32, cfg)))
    got16 = np.asarray(logits_of(ckpt.convert_libra_state_dict(sd16, cfg)))

    sel = np.isfinite(want) & np.asarray(mask).astype(bool)[None, :, :, None]
    # 4096-width fp32 accumulation parity
    ref_scale = np.abs(want[sel]).mean()
    assert np.abs(got32[sel] - want[sel]).max() / ref_scale < 5e-4
    # bf16 weight-rounding drift bound (the safetensors checkpoint path)
    drift = np.abs(got16[sel] - got32[sel]).max() / ref_scale
    assert drift < 5e-2, drift
    assert drift > 0                 # the bf16 path really rounded
