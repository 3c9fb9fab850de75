"""End-to-end CLI test: `python -m libra_tpu.train` on a tiny from-scratch
model over synthetic tar shards -- the full reference call stack
(SURVEY.md section 3.1) in miniature."""

import io
import json
import subprocess
import sys
import tarfile

import numpy as np
import pytest
import yaml
from PIL import Image

from tests.test_data_layer import _make_shard


def test_train_cli_smoke(tmp_path):
    shards = tmp_path / "shards"
    shards.mkdir()
    _make_shard(shards / "s-000.tar", n=8, seed=0)

    cfg = {
        "model": {
            "arch": "libra_train_wrapper",
            "config": {
                "vocab_size": 256, "hidden_size": 64,
                "intermediate_size": 128, "num_hidden_layers": 2,
                "num_attention_heads": 4, "vision_vocab_size": 18,
                "vision_codebook_num": 2, "max_vision_token_length": 6,
                "image_feature_resolution": 2, "contiguous_signal_size": 32,
                "bridge_rank": 4, "dtype": "float32",
            },
            "model_kwargs": {"frozen_language": True},
        },
        "datasets": {
            "laion": {
                "vis_processor": {"train": {"name": "libra_image",
                                            "image_size": 28}},
                "text_processor": {"train": {"name": "libra_caption"}},
                "build_info": {"storage": str(shards / "s-*.tar")},
                "kwargs": {"i2t_prob": 0.5, "num_img_tokens": 6},
            },
        },
        "run": {
            "output_dir": str(tmp_path / "out"),
            "max_steps": 3,
            "learning_rate": 1e-3,
            "per_device_train_batch_size": 2,
            "logging_steps": 1,
            "save_steps": 0,
            "model_max_length": 64,
            "mesh": {"data": 1, "fsdp": 2, "model": 2},
        },
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    proc = subprocess.run(
        [sys.executable, "-m", "libra_tpu.train", "--cfg-path", str(cfg_path),
         "--options", "run.max_steps=2"],
        capture_output=True, text=True, timeout=600,
        env={"PYTHONPATH": ".", "JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
             "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root"},
        cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "loss" in proc.stdout or "loss" in proc.stderr
