"""Training harness: the reference's HF-Trainer loop re-built TPU-native.

Covers the run-config surface of libra_pretrain.yaml / libra_instruction.yaml
(SURVEY.md section 2.4): max_steps/epochs, real gradient accumulation
(scan-of-micro-batches inside the compiled step; trainer.accum_train_step),
eval every eval_steps (loss-only), checkpoint save/resume via Orbax, rank-0
logging, per-step timing, and jax.profiler trace hooks (the reference had
no tracing at all; SURVEY.md section 5 asks for it here).
"""

from __future__ import annotations

import json
import logging
import queue
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, Iterator, Optional

import jax
import numpy as np

from libra_tpu.config import LibraConfig
from libra_tpu.training.optimizer import OptimizerConfig
from libra_tpu.training.trainer import Trainer

logger = logging.getLogger("libra_tpu.train")


@dataclass
class HarnessConfig:
    output_dir: str = "output"
    max_steps: int = 1000
    per_device_train_batch_size: int = 8
    gradient_accumulation_steps: int = 1
    logging_steps: int = 10
    eval_steps: int = 0            # 0 = no eval
    save_steps: int = 1000
    save_total_limit: int = 1
    resume_from_checkpoint: bool = False
    profile_steps: tuple = ()      # e.g. (10, 20): trace between these steps
    seed: int = 42

    @classmethod
    def from_run_cfg(cls, run: Dict[str, Any]) -> "HarnessConfig":
        known = {f: run[f] for f in (
            "output_dir", "max_steps", "per_device_train_batch_size",
            "gradient_accumulation_steps", "logging_steps", "eval_steps",
            "save_steps", "save_total_limit", "seed",
            "resume_from_checkpoint") if f in run}
        return cls(**known)


class Prefetcher:
    """Background-thread sample prefetch (the reference's DataLoader
    workers). Keeps the host busy preparing the next batch while the
    device runs the current step."""

    def __init__(self, it: Iterable, depth: int = 4):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._done = object()
        self._thread = threading.Thread(target=self._run, args=(iter(it),),
                                        daemon=True)
        self._thread.start()

    def _run(self, it: Iterator):
        try:
            for x in it:
                self._q.put(x)
        finally:
            self._q.put(self._done)

    def __iter__(self):
        while True:
            x = self._q.get()
            if x is self._done:
                return
            yield x


def batched(sample_iter: Iterable, batch_size: int,
            collater: Callable) -> Iterator:
    buf = []
    for s in sample_iter:
        if s is None:
            continue
        buf.append(s)
        if len(buf) == batch_size:
            yield collater(buf)
            buf = []


def map_style_epochs(dataset, batch_size: int, seed: int) -> Iterator:
    """Shuffled epoch iterator over a map-style dataset, repeated forever."""
    rng = np.random.RandomState(seed)
    epoch = 0
    while True:
        order = rng.permutation(len(dataset))
        for i in order:
            yield dataset[int(i)]
        epoch += 1


class TrainHarness:
    def __init__(self, trainer: Trainer, wrapper, harness_cfg: HarnessConfig,
                 train_data, eval_data=None, max_length: Optional[int] = None):
        self.trainer = trainer
        self.wrapper = wrapper
        self.cfg = harness_cfg
        self.train_data = train_data
        self.eval_data = eval_data
        self.max_length = max_length
        self.out = Path(harness_cfg.output_dir)
        self.out.mkdir(parents=True, exist_ok=True)
        self._metrics_file = open(self.out / "metrics.jsonl", "a")
        # tensorboard parity (reference: run report_to: tensorboard);
        # torch's SummaryWriter is used when available, else jsonl only
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir=str(self.out / "tb"))
        except Exception:  # noqa: BLE001
            pass

    def _log(self, record: Dict[str, Any]):
        if jax.process_index() == 0:   # rank-0 logging (dist_utils parity)
            logger.info("%s", record)
            self._metrics_file.write(json.dumps(record) + "\n")
            self._metrics_file.flush()
            if self._tb is not None and "step" in record:
                for k, v in record.items():
                    if k != "step" and isinstance(v, (int, float)):
                        self._tb.add_scalar(k, v, record["step"])

    def _batch_iter(self) -> Iterator:
        bs = self.cfg.per_device_train_batch_size
        ds = self.train_data
        if getattr(ds, "is_streaming", False):
            samples = Prefetcher(ds)
        else:
            samples = Prefetcher(map_style_epochs(ds, bs, self.cfg.seed))
        return batched(samples, bs, ds.collater)

    def train(self) -> Dict[str, Any]:
        from libra_tpu import checkpoint as ckpt

        step0 = 0
        if self.cfg.resume_from_checkpoint:
            latest = sorted(self.out.glob("step_*"))
            if latest:
                self.trainer.state = ckpt.restore_checkpoint(
                    str(self.out), self.trainer.state,
                    step=int(latest[-1].name.split("_")[1]))
                step0 = int(self.trainer.state.step)
                self._log({"event": "resume", "step": step0})

        batches = self._batch_iter()
        t_last = time.perf_counter()
        last_metrics: Dict[str, Any] = {}
        for step in range(step0, self.cfg.max_steps):
            if self.cfg.profile_steps and step == self.cfg.profile_steps[0]:
                jax.profiler.start_trace(str(self.out / "trace"))
            # REAL gradient accumulation: one rematerialised fwd/bwd per
            # micro-batch inside the compiled step (trainer.accum_train_step)
            # -- peak memory stays at micro-batch scale, result matches the
            # concatenated batch exactly
            micros = [self.wrapper.prepare_batch(next(batches),
                                                 self.max_length)
                      for _ in range(self.cfg.gradient_accumulation_steps)]
            metrics = self.trainer.step_accum(micros)

            if self.cfg.profile_steps and step == self.cfg.profile_steps[-1]:
                jax.profiler.stop_trace()

            if (step + 1) % self.cfg.logging_steps == 0:
                now = time.perf_counter()
                last_metrics = {
                    "step": step + 1,
                    "loss": float(metrics["loss"]),
                    "grad_norm": float(metrics["grad_norm"]),
                    "steps_per_sec": self.cfg.logging_steps / (now - t_last),
                }
                self._log(last_metrics)
                t_last = now

            if self.cfg.eval_steps and (step + 1) % self.cfg.eval_steps == 0 \
                    and self.eval_data is not None:
                self._log({"step": step + 1, "eval_loss": self.evaluate()})

            if self.cfg.save_steps and (step + 1) % self.cfg.save_steps == 0:
                ckpt.save_checkpoint(str(self.out), self.trainer.state,
                                     step=step + 1)
                self._prune_checkpoints()
        return last_metrics

    def evaluate(self, max_batches: int = 16) -> float:
        bs = self.cfg.per_device_train_batch_size
        losses = []
        it = (self.eval_data[i] for i in range(len(self.eval_data)))
        for batch in batched(it, bs, self.eval_data.collater):
            arrays = self.wrapper.prepare_batch(batch, self.max_length)
            losses.append(float(self.trainer._eval(self.trainer.state,
                                                   self.trainer.shard_batch(arrays))))
            if len(losses) >= max_batches:
                break
        return sum(losses) / max(1, len(losses))

    def _prune_checkpoints(self):
        ckpts = sorted(self.out.glob("step_*"),
                       key=lambda p: int(p.name.split("_")[1]))
        import shutil
        for p in ckpts[:-self.cfg.save_total_limit]:
            shutil.rmtree(p, ignore_errors=True)


