"""Training CLI: `python -m libra_tpu.train --cfg-path cfg.yaml
[--options k=v ...]`.

Equivalent of the reference entry point (train.py:25-119): load + validate
the 3-section YAML, build model/tokenizer via the registry, build datasets
via their builders, construct the mesh + optimizer from the run section,
train. torchrun/NCCL/DeepSpeed are replaced by a jax.sharding.Mesh; for
multi-host, jax.distributed.initialize() is called when the environment
provides coordinator addresses.
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Any, Dict

import jax


def build_model_and_tokenizer(model_cfg: Dict[str, Any]):
    """Build (LibraConfig, params, LibraTokenizer) either from a pretrained
    reference checkpoint dir or from scratch off config dims."""
    from libra_tpu import checkpoint as ckpt
    from libra_tpu.config import (LibraConfig, VQGANConfig,
                                  load_vision_tokenizer_config)
    from libra_tpu.models import libra as M, vqgan as vqgan_model
    from libra_tpu.tokenization import (HFTextTokenizer, ImageTokenizer,
                                        LibraTokenizer, SimpleTextTokenizer)

    pretrained = model_cfg.get("pretrained")
    if pretrained:
        cfg = LibraConfig.from_pretrained(pretrained)
        sd = ckpt.load_torch_state_dict(pretrained)
        # optional extra weight override on top of from_pretrained, with
        # legacy 'model.'/'module.' prefix surgery
        # (reference: LibraTrainWrapper, modeling_libra.py:1311-1340)
        extra = model_cfg.get("pretrained_weight")
        if extra:
            sd = ckpt.load_torch_state_dict(extra)
        params = ckpt.convert_libra_state_dict(sd, cfg)
        text_tok = HFTextTokenizer(pretrained)
        vq_cfg, vq_ckpt, max_vt, clip_dir = \
            load_vision_tokenizer_config(pretrained)
        clip_params = None
        if vq_cfg.encoder_name == "clip" and clip_dir is not None:
            vq_cfg, clip_params = ckpt.load_nested_clip(clip_dir, vq_cfg)
        vq_sd = ckpt.load_torch_state_dict(vq_ckpt)
        vq_params = ckpt.convert_vqgan_state_dict(vq_sd, vq_cfg,
                                                  clip_params=clip_params)
        img_tok = ImageTokenizer(vq_cfg, vq_params,
                                 token_offset=cfg.vocab_size,
                                 max_vision_token_length=(
                                     max_vt or cfg.max_vision_token_length),
                                 downsample_ratio=(
                                     ImageTokenizer.infer_downsample_ratio(
                                         vq_ckpt)))
    else:
        cfg = LibraConfig.from_dict(model_cfg.get("config", {}) | {
            k: v for k, v in model_cfg.items()
            if k not in ("arch", "config", "vqgan")})
        params = M.init_params(jax.random.PRNGKey(0), cfg)
        vq_cfg = VQGANConfig.tiny() if cfg.hidden_size < 512 else VQGANConfig()
        vq_params = vqgan_model.init_params(jax.random.PRNGKey(1), vq_cfg)
        text_tok = SimpleTextTokenizer(vocab_size=cfg.vocab_size)
        img_tok = ImageTokenizer(vq_cfg, vq_params,
                                 token_offset=cfg.vocab_size,
                                 max_vision_token_length=cfg.max_vision_token_length)
    tokenizer = LibraTokenizer(text_tok, img_tok)
    return cfg, params, tokenizer


def main(argv=None):
    parser = argparse.ArgumentParser("libra_tpu training")
    parser.add_argument("--cfg-path", required=True)
    parser.add_argument("--options", nargs="*", default=None,
                        help="dotlist overrides: run.max_steps=100")
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()

    # import for registry side effects
    import libra_tpu.data.builders  # noqa: F401
    import libra_tpu.data.processors  # noqa: F401
    import libra_tpu.train_wrapper as tw
    from libra_tpu.data.base import concat_datasets, reorg_datasets_by_split
    from libra_tpu.parallel import make_mesh
    from libra_tpu.registry import registry
    from libra_tpu.run_config import RunConfig
    from libra_tpu.training.harness import HarnessConfig, TrainHarness
    from libra_tpu.training.optimizer import OptimizerConfig
    from libra_tpu.training.trainer import Trainer

    cfg = RunConfig(args.cfg_path, args.options)
    model_cfg, run = cfg.model_cfg, cfg.run_cfg

    if model_cfg.get("arch") == "debug_model":
        # data-pipeline smoke mode (reference: build_model no_model=True)
        _run_debug_model(cfg)
        return

    libra_cfg, params, tokenizer = build_model_and_tokenizer(model_cfg)
    wrapper = tw.LibraTrainWrapper(libra_cfg, tokenizer)
    params = wrapper.change_pad_token_to_eos(params)

    datasets = {}
    for name, ds_cfg in cfg.datasets_cfg.items():
        builder = registry.get_builder_class(name)(
            ds_cfg, tokenizer=tokenizer.text_tokenizer)
        datasets[name] = builder.build_datasets()
    by_split = concat_datasets(reorg_datasets_by_split(datasets))
    train_ds = by_split["train"]
    eval_ds = by_split.get("val") or by_split.get("eval")

    mk = run.get("mesh", {})
    n_dev = len(jax.devices())
    # default fsdp absorbs every device the EXPLICIT axes leave free
    # (dividing by data too -- a config setting only data+seq used to
    # over-size fsdp and fail in make_mesh, ADVICE r3 finding 3)
    explicit = mk.get("data", 1) * mk.get("model", 1) * mk.get("seq", 1)
    if n_dev % explicit != 0:
        raise ValueError(f"mesh axes {mk} need a divisor of {n_dev} "
                         f"devices, got product {explicit}")
    mesh = make_mesh(data=mk.get("data", 1),
                     fsdp=mk.get("fsdp", n_dev // explicit),
                     model=mk.get("model", 1),
                     seq=mk.get("seq", 1))

    opt_cfg = OptimizerConfig(
        learning_rate=run.get("learning_rate", 1e-4),
        warmup_ratio=run.get("warmup_ratio", 0.05),
        total_steps=run.get("max_steps", 1000),
        weight_decay=run.get("weight_decay", 0.01),
        max_grad_norm=run.get("max_grad_norm", 1.0),
        frozen_language=model_cfg.get("model_kwargs", {}).get(
            "frozen_language", False),
        freeze_vision_value=model_cfg.get("model_kwargs", {}).get(
            "freeze_vision_value", False),
        freeze_text_embedding=model_cfg.get("model_kwargs", {}).get(
            "freeze_text_embedding", False),
        freeze_vision_embedding=model_cfg.get("model_kwargs", {}).get(
            "freeze_vision_embedding", False),
    )
    # run.remat: "full" (default; the proven 11B fsdp8 memory fit),
    # "big_dots" / "names:..." (skip backward recompute of tagged dot
    # outputs; see models.libra._remat_policy + docs/training.md)
    trainer = Trainer(libra_cfg, params, mesh, opt_cfg,
                      remat=run.get("remat", True))
    harness = TrainHarness(
        trainer, wrapper, HarnessConfig.from_run_cfg(run),
        train_ds, eval_ds,
        max_length=run.get("model_max_length"))
    final = harness.train()
    print(final)


def _run_debug_model(cfg) -> None:
    import libra_tpu.data.builders  # noqa: F401
    import libra_tpu.data.processors  # noqa: F401
    from libra_tpu.data.base import concat_datasets, reorg_datasets_by_split
    from libra_tpu.registry import registry
    from libra_tpu.tokenization import SimpleTextTokenizer
    from libra_tpu.train_wrapper import DebugModel
    from libra_tpu.training.harness import Prefetcher, batched

    tok = SimpleTextTokenizer()
    datasets = {}
    for name, ds_cfg in cfg.datasets_cfg.items():
        builder = registry.get_builder_class(name)(ds_cfg, tokenizer=tok)
        datasets[name] = builder.build_datasets()
    train_ds = concat_datasets(reorg_datasets_by_split(datasets))["train"]
    model = DebugModel()
    bs = cfg.run_cfg.get("per_device_train_batch_size", 4)
    steps = cfg.run_cfg.get("max_steps", 5)
    it = batched(Prefetcher(train_ds), bs, train_ds.collater)
    for step in range(steps):
        batch = next(it)
        loss = model.forward(batch)
        print({"step": step, "debug_loss": round(loss, 5),
               "batch": len(batch["samples"]["language"])})


if __name__ == "__main__":
    main()
