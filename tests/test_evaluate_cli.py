"""Evaluation CLI smoke tests over a synthetic COCO-style dataset."""

import json
import subprocess
import sys

import numpy as np
import pytest
import yaml
from PIL import Image


@pytest.fixture()
def coco_dir(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    anns = []
    for i in range(6):
        name = f"img{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (32, 40, 3), np.uint8)).save(
            img_dir / name)
        anns.append({"image": name, "image_id": i,
                     "caption": f"caption number {i}"})
    (tmp_path / "ann.json").write_text(json.dumps(anns))
    return tmp_path


def _cfg(tmp_path, split="val"):
    return {
        "model": {
            "arch": "libra_train_wrapper",
            "config": {
                "vocab_size": 256, "hidden_size": 64,
                "intermediate_size": 128, "num_hidden_layers": 2,
                "num_attention_heads": 4, "vision_vocab_size": 18,
                "vision_codebook_num": 2, "max_vision_token_length": 6,
                "image_feature_resolution": 2, "contiguous_signal_size": 32,
                "bridge_rank": 4, "dtype": "float32"},
        },
        "datasets": {
            "coco_caption": {
                "vis_processor": {"train": {"name": "libra_image",
                                            "image_size": 28}},
                "text_processor": {"train": {"name": "libra_caption"}},
                "build_info": {
                    "annotations": {split: {"storage": str(tmp_path / "ann.json")}},
                    "images": {"storage": str(tmp_path / "images")},
                },
                "kwargs": {"i2t_prob": 1.0, "num_img_tokens": 6},
            },
        },
        "run": {"per_device_train_batch_size": 2},
    }


def _run(cfg_path, *extra):
    return subprocess.run(
        [sys.executable, "-m", "libra_tpu.evaluate", "--cfg-path",
         str(cfg_path), *extra],
        capture_output=True, text=True, timeout=600,
        env={"PYTHONPATH": ".", "JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
             "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root"},
        cwd="/root/repo")


def test_eval_loss_mode(coco_dir):
    cfg_path = coco_dir / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(_cfg(coco_dir)))
    proc = _run(cfg_path, "--mode", "loss", "--max-samples", "4")
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert np.isfinite(out["eval_loss"])


def test_eval_caption_mode(coco_dir):
    cfg_path = coco_dir / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(_cfg(coco_dir)))
    out_path = coco_dir / "preds.json"
    proc = _run(cfg_path, "--mode", "caption", "--max-samples", "4",
                "--output", str(out_path))
    assert proc.returncode == 0, proc.stderr[-3000:]
    preds = json.loads(out_path.read_text())
    assert len(preds) == 4
    assert all("caption" in p for p in preds)


@pytest.fixture()
def vqa_dir(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    anns = []
    for i in range(4):
        name = f"img{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (32, 40, 3), np.uint8)).save(
            img_dir / name)
        anns.append({"image": name, "image_id": i, "question_id": i,
                     "caption": f"caption {i}",
                     "question": f"what is in image {i}?",
                     "answers": ["a cat"] * 5 + ["a dog"] * 5})
    (tmp_path / "ann.json").write_text(json.dumps(anns))
    return tmp_path


def test_eval_vqa_mode(vqa_dir):
    """--mode vqa drives LLaVA-format questions through the pipeline and
    scores with metrics.vqa_accuracy (VERDICT r3 item 8)."""
    cfg_path = vqa_dir / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(_cfg(vqa_dir)))
    out_path = vqa_dir / "vqa_preds.json"
    proc = _run(cfg_path, "--mode", "vqa", "--max-samples", "3",
                "--output", str(out_path))
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["scored"] == 3
    assert 0.0 <= out["vqa_accuracy"] <= 1.0
    preds = json.loads(out_path.read_text())
    assert len(preds) == 3 and all("answer" in p for p in preds)
