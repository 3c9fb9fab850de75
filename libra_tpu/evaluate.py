"""Evaluation CLI: captioning/VQA generation over a karpathy-style split.

`python -m libra_tpu.evaluate --cfg-path cfg.yaml [--options k=v]`

Covers the reference's eval surfaces (SURVEY.md section 4): loss-only
regression eval (COCO val, prediction_loss_only) and a generation eval
that writes {image_id, caption} predictions json for external scoring
(the reference scores through the paper's harness, not in-repo).
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path
from typing import Any, Dict, List

import numpy as np


def generate_captions(pipeline, dataset, max_samples: int = 100,
                      question: str = "Describe the image concisely.",
                      max_new_tokens: int = 64,
                      batch_size: int = 8) -> List[Dict[str, Any]]:
    """Greedy captioning over a map-style caption dataset; images are read
    through the dataset's vis_root annotations."""
    import os
    from PIL import Image

    preds = []
    annotations = dataset.annotation[:max_samples]
    for lo in range(0, len(annotations), batch_size):
        anns = annotations[lo:lo + batch_size]
        images = [Image.open(os.path.join(dataset.vis_root, a["image"]))
                  .convert("RGB") for a in anns]
        outs = pipeline.chat([question] * len(images), images=images,
                             max_new_tokens=max_new_tokens)
        for a, cap in zip(anns, outs):
            preds.append({"image_id": a.get("image_id", a["image"]),
                          "caption": cap})
    return preds


def generate_vqa_answers(pipeline, dataset, max_samples: int = 100,
                         max_new_tokens: int = 16,
                         batch_size: int = 8) -> List[Dict[str, Any]]:
    """Open-ended VQA over annotation rows carrying a "question" field
    (LLaVA/VQAv2-format: each row has image, question, and the human
    "answers" list). Questions drive the v1 chat template through the
    pipeline exactly like the reference demo's VQA turns
    (BASELINE config 4)."""
    import os
    from PIL import Image

    preds = []
    annotations = [a for a in dataset.annotation if "question" in a]
    annotations = annotations[:max_samples]
    for lo in range(0, len(annotations), batch_size):
        anns = annotations[lo:lo + batch_size]
        images = [Image.open(os.path.join(dataset.vis_root, a["image"]))
                  .convert("RGB") for a in anns]
        outs = pipeline.chat([a["question"] for a in anns], images=images,
                             max_new_tokens=max_new_tokens)
        for a, ans in zip(anns, outs):
            preds.append({"question_id": a.get("question_id",
                                               a.get("image_id", a["image"])),
                          "answer": ans})
    return preds


def score_vqa(preds: List[Dict[str, Any]],
              annotations: List[Dict[str, Any]]) -> Dict[str, Any]:
    """min(1, #matching-humans/3) accuracy (libra_tpu.metrics.vqa_accuracy)
    against each row's "answers" list (or single "answer")."""
    from libra_tpu.metrics import vqa_accuracy
    answers = {}
    for a in annotations:
        if "question" not in a:
            continue
        key = str(a.get("question_id", a.get("image_id", a.get("image"))))
        ans = a.get("answers", a.get("answer"))
        if isinstance(ans, str):
            ans = [ans]
        if ans:
            answers[key] = ans
    cands = {str(p["question_id"]): p["answer"] for p in preds}
    return {"vqa_accuracy": round(vqa_accuracy(cands, answers), 4),
            "scored": len([q for q in cands if q in answers])}


def main(argv=None):
    parser = argparse.ArgumentParser("libra_tpu evaluation")
    parser.add_argument("--cfg-path", required=True)
    parser.add_argument("--options", nargs="*", default=None)
    parser.add_argument("--mode", choices=["loss", "caption", "vqa"],
                        default="loss")
    parser.add_argument("--max-samples", type=int, default=100)
    parser.add_argument("--output", default="predictions.json")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)

    import libra_tpu.data.builders  # noqa: F401
    import libra_tpu.data.processors  # noqa: F401
    from libra_tpu.data.base import concat_datasets, reorg_datasets_by_split
    from libra_tpu.parallel import make_mesh
    from libra_tpu.registry import registry
    from libra_tpu.run_config import RunConfig
    from libra_tpu.train import build_model_and_tokenizer
    from libra_tpu.train_wrapper import LibraTrainWrapper

    cfg = RunConfig(args.cfg_path, args.options)
    libra_cfg, params, tokenizer = build_model_and_tokenizer(cfg.model_cfg)

    datasets = {}
    for name, ds_cfg in cfg.datasets_cfg.items():
        builder = registry.get_builder_class(name)(
            ds_cfg, tokenizer=tokenizer.text_tokenizer)
        datasets[name] = builder.build_datasets()
    by_split = concat_datasets(reorg_datasets_by_split(datasets))
    eval_ds = (by_split.get("val") or by_split.get("eval")
               or by_split.get("test") or by_split.get("train"))

    if args.mode == "loss":
        import math
        import jax
        from libra_tpu.training.harness import batched
        from libra_tpu.training.trainer import Trainer
        from libra_tpu.training.optimizer import OptimizerConfig
        bs = cfg.run_cfg.get("per_device_train_batch_size", 8)
        # batch must divide the data-sharding axes
        fsdp = math.gcd(len(jax.devices()), bs)
        mesh = make_mesh(1, fsdp, 1)
        trainer = Trainer(libra_cfg, params, mesh, OptimizerConfig())
        wrapper = LibraTrainWrapper(libra_cfg, tokenizer)
        losses = []
        it = (eval_ds[i] for i in range(len(eval_ds)))
        for batch in batched(it, bs, eval_ds.collater):
            arrays = wrapper.prepare_batch(batch)
            losses.append(float(trainer._eval(
                trainer.state, trainer.shard_batch(arrays))))
            if len(losses) * bs >= args.max_samples:
                break
        result = {"eval_loss": sum(losses) / max(1, len(losses)),
                  "batches": len(losses)}
        print(json.dumps(result))
    else:
        from libra_tpu.data.processors import LibraEvalImageProcessor
        from libra_tpu.pipeline import LibraPipeline
        pipe = LibraPipeline(
            libra_cfg, params, tokenizer,
            image_processor=LibraEvalImageProcessor(
                tokenizer.image_tokenizer.cfg.clip))
        if args.mode == "vqa":
            preds = generate_vqa_answers(pipe, eval_ds,
                                         max_samples=args.max_samples)
            Path(args.output).write_text(json.dumps(preds, indent=1))
            result = {"predictions": len(preds), "output": args.output}
            result.update(score_vqa(preds, eval_ds.annotation))
        else:
            preds = generate_captions(pipe, eval_ds,
                                      max_samples=args.max_samples)
            Path(args.output).write_text(json.dumps(preds, indent=1))
            result = {"predictions": len(preds), "output": args.output}
            # score in-repo against the split's own reference captions
            # (CIDEr-D / BLEU-4; the reference defers this to an external
            # harness -- libra_tpu.metrics closes that gap)
            from libra_tpu.metrics import score_captions
            result.update(score_captions(preds, eval_ds.annotation))
        print(json.dumps(result))


if __name__ == "__main__":
    main()
