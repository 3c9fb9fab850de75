"""Data layer tests: tar-shard streaming, pair-sample construction, label
spans, conversation templates, instruction dataset, and the full
data -> tokenizer -> labels -> train-step slice."""

import io
import json
import os
import tarfile

import jax
import numpy as np
import pytest
from PIL import Image

from libra_tpu.config import CLIPVisionConfig, LibraConfig, VQGANConfig
from libra_tpu.data import conversation as conv_lib
from libra_tpu.data.caption_format import IMG_PH
from libra_tpu.data.instruction import InstructionDataset
from libra_tpu.data.laion import LaionDataset
from libra_tpu.data.processors import (LibraCaptionProcessor,
                                       LibraImageProcessor, expand2square)
from libra_tpu.data.webdata import ShardStream, expand_shards
from libra_tpu.models import libra as M, vqgan as vqgan_model
from libra_tpu.tokenization import (ImageTokenizer, LibraTokenizer,
                                    SimpleTextTokenizer)
from libra_tpu.train_wrapper import IGNORE_INDEX, LibraTrainWrapper, build_labels


def _make_shard(path, n=6, seed=0):
    rng = np.random.RandomState(seed)
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            key = f"{seed:03d}{i:05d}"
            img = Image.fromarray(
                rng.randint(0, 255, (40, 52, 3), np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{key}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            meta = json.dumps({"caption": f"a photo number {i} with cats"}
                              ).encode()
            info = tarfile.TarInfo(f"{key}.json")
            info.size = len(meta)
            tf.addfile(info, io.BytesIO(meta))


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("shards")
    _make_shard(d / "shard-000.tar", seed=0)
    _make_shard(d / "shard-001.tar", seed=1)
    return d


def test_expand_shards_brace():
    out = expand_shards("/x/s-{000..003}.tar")
    assert out == [f"/x/s-{i:03d}.tar" for i in range(4)]


def test_shard_stream_decodes(shard_dir):
    stream = ShardStream(str(shard_dir / "shard-*.tar"), shuffle_bufsize=4,
                         shuffle_initial=1, seed=0, resample=False)
    samples = []
    for s in stream:
        samples.append(s)
        if len(samples) >= 8:
            break
    assert len(samples) == 8
    assert all(s["jpg"].mode == "RGB" for s in samples)
    assert all("caption" in s["json"] for s in samples)


def _tiny_processors():
    clip_cfg = CLIPVisionConfig.tiny()
    return (LibraImageProcessor(clip_cfg), LibraCaptionProcessor())


def test_laion_i2t_t2i_samples(shard_dir):
    vis, text = _tiny_processors()
    tok = SimpleTextTokenizer(vocab_size=256)
    Mv = 6

    def make(i2t_prob):
        return LaionDataset(vis, text, str(shard_dir / "shard-*.tar"),
                            tokenizer=tok, i2t_prob=i2t_prob,
                            num_img_tokens=Mv, seed=0)

    s = next(iter(make(1.0)))        # always i2t
    assert s["language"].count(IMG_PH) == Mv
    assert s["language"].index(IMG_PH) == 0        # image is background
    assert s["contiguous_ignore_sign"] is False
    assert s["vision"].shape == (28, 28, 3)
    spans = s["label_mask_position_map"]
    assert spans[0][0] == 0                        # prompt mask from 0
    # first-text-after-image masked
    assert spans[1][1] == spans[1][0] + 1

    s = next(iter(make(0.0)))        # always t2i
    assert s["language"].rstrip().endswith(IMG_PH)  # image is respond
    assert s["contiguous_ignore_sign"] is True


def test_conversation_v1_prompt():
    conv = conv_lib.conv_templates["v1"].copy()
    conv.append_message("USER", "hello")
    conv.append_message("ASSISTANT", "hi there")
    p = conv.get_prompt()
    assert p.startswith("A chat between")
    assert "USER: hello ASSISTANT: hi there </s>" in p


def test_instruction_dataset_v1(tmp_path):
    ann = [
        {"id": "1", "image": "img1.jpg",
         "conversations": [
             {"from": "human", "value": "<image>\nwhat is this?"},
             {"from": "gpt", "value": "a cat."},
             {"from": "human", "value": "what color?"},
             {"from": "gpt", "value": "black."}]},
        {"id": "2",
         "conversations": [
             {"from": "human", "value": "just text?"},
             {"from": "gpt", "value": "yes."}]},
    ]
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))
    img = Image.fromarray(np.random.RandomState(0)
                          .randint(0, 255, (30, 30, 3), np.uint8))
    img.save(tmp_path / "img1.jpg")

    vis, _ = _tiny_processors()
    tok = SimpleTextTokenizer(vocab_size=256)
    ds = InstructionDataset(str(ann_path), vis, "v1", tok,
                            num_img_tokens=6, vis_root=str(tmp_path),
                            image_size=28)
    s0 = ds[0]
    assert s0["has_image"] is True
    assert s0["language"].count(IMG_PH) == 6
    assert "ASSISTANT: a cat. </s>" in s0["language"]
    # spans: bos + 2 user turns masked
    assert len(s0["label_mask_position_map"]) == 3

    s1 = ds[1]
    assert s1["has_image"] is False
    assert np.abs(s1["vision"]).sum() == 0
    assert IMG_PH not in s1["language"]


def test_missing_image_returns_none(tmp_path):
    ann = [{"id": "1", "image": "nope.jpg",
            "conversations": [
                {"from": "human", "value": "<image>\nq"},
                {"from": "gpt", "value": "a"}]}]
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    vis, _ = _tiny_processors()
    ds = InstructionDataset(str(p), vis, "v1", SimpleTextTokenizer(),
                            num_img_tokens=6, vis_root=str(tmp_path))
    assert ds[0] is None


def test_build_labels_spans():
    ids = np.arange(24).reshape(2, 2, 6) + 10
    ids[0, 0, 2] = 999   # boi
    mask = np.ones((2, 6), np.int64)
    mask[1, 5] = 0
    spans = [[(0, 2)], [(1, None)]]   # None end => to end of row
    labels = build_labels(ids, mask, spans, boi_token_id=999, bos_token_id=1)
    assert (labels[:, 0, :2] == IGNORE_INDEX).all()
    assert (labels[0, 0, 2] == IGNORE_INDEX)       # boi
    assert (labels[:, 1, 1:] == IGNORE_INDEX).all()  # span to end
    assert labels[0, 1, 0] == ids[0, 1, 0]


def test_end_to_end_laion_to_train_step(shard_dir):
    """streaming shard -> pair sample -> joint tokenizer -> labels ->
    train loss: the full data slice of the pretrain call stack."""
    cfg = LibraConfig.tiny()
    vq_cfg = VQGANConfig.tiny()
    key = jax.random.PRNGKey(0)
    params = M.init_params(key, cfg)
    vq_params = vqgan_model.init_params(jax.random.PRNGKey(1), vq_cfg)
    text_tok = SimpleTextTokenizer(vocab_size=cfg.vocab_size)
    img_tok = ImageTokenizer(vq_cfg, vq_params, token_offset=cfg.vocab_size,
                             max_vision_token_length=cfg.max_vision_token_length)
    joint = LibraTokenizer(text_tok, img_tok)

    vis, text = _tiny_processors()
    ds = LaionDataset(vis, text, str(shard_dir / "shard-*.tar"),
                      tokenizer=text_tok, i2t_prob=0.5,
                      num_img_tokens=cfg.max_vision_token_length, seed=3)
    it = iter(ds)
    batch = ds.collater([next(it) for _ in range(2)])

    wrapper = LibraTrainWrapper(cfg, joint)
    arrays = wrapper.prepare_batch(batch)
    assert arrays["input_ids"].shape[0] == cfg.vision_codebook_num

    from libra_tpu.training.trainer import loss_fn
    import functools
    loss = jax.jit(functools.partial(loss_fn, cfg=cfg, remat=False))(
        params, batch=arrays)
    assert np.isfinite(float(loss)), float(loss)
    assert float(loss) < 50.0
