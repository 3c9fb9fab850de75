"""Training wrapper: raw data-layer samples -> decoder-ready batches.

Behavior parity with the reference LibraTrainWrapper
(modeling_libra.py:1292-1437): joint tokenization of the batch, label
construction from label_mask_position_map spans (pad/BOI/BOS + per-sample
spans -> -100), pad-embedding rewrite, and freeze policy selection (the
freeze policies themselves live in libra_tpu.training.optimizer as optax
partitions).

TPU note: the reference runs CLIP+VQGAN tokenization inside the train step
on GPU; here the image encode is a separately-jitted device function invoked
from prepare_batch, and the decoder train step consumes ready arrays --
XLA overlaps the two dispatches, and a fully-fused variant can scatter
inside the step once per-batch image counts are static.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from libra_tpu.config import LibraConfig
from libra_tpu.registry import registry
from libra_tpu.tokenization import LibraTokenizer

IGNORE_INDEX = -100


def build_labels(input_ids: np.ndarray, attention_mask: np.ndarray,
                 label_mask_position_map: List[List],
                 boi_token_id: int, bos_token_id: int) -> np.ndarray:
    """(Q, B, N) labels with -100 at pad, BOI, BOS, and masked spans
    (reference: get_labels, modeling_libra.py:1397-1411). A span end of
    None masks to the end of the sequence (python slice semantics, kept
    for parity)."""
    labels = np.array(input_ids, np.int64)
    labels[:, np.asarray(attention_mask) == 0] = IGNORE_INDEX
    labels[labels == boi_token_id] = IGNORE_INDEX
    labels[labels == bos_token_id] = IGNORE_INDEX
    for b, spans in enumerate(label_mask_position_map):
        for start, end in spans:
            if start is None:
                continue
            labels[:, b, slice(start, end)] = IGNORE_INDEX
    return labels


@registry.register_model("debug_model")
class DebugModel:
    """Stub model to exercise the data pipeline + harness loop without the
    11B model (reference: utils/train_utils.py:51-63 / build_model
    no_model=True)."""

    def __init__(self):
        import jax
        import jax.numpy as jnp
        key = jax.random.PRNGKey(0)
        self.w = jax.random.normal(key, (100, 200)) * 0.01
        self._step = jax.jit(
            lambda w, x: jnp.mean((x @ w) ** 2))

    def forward(self, batch: Dict[str, Any]) -> float:
        import jax
        n = len(batch["samples"]["language"])
        x = jax.random.normal(jax.random.PRNGKey(n), (max(n, 1), 100))
        return float(self._step(self.w, x))


@registry.register_model("libra_train_wrapper")
class LibraTrainWrapper:
    """Host-side batch preparation around the functional model."""

    def __init__(self, cfg: LibraConfig, tokenizer: LibraTokenizer):
        self.cfg = cfg
        self.tokenizer = tokenizer

    def change_pad_token_to_eos(self, params):
        """Copy the EOS embedding row onto PAD so padding doesn't live at a
        different scale (reference: modeling_libra.py:1390-1395)."""
        emb = np.array(params["embed_tokens"])
        pad = self.tokenizer.text_tokenizer.pad_token_id
        eos = self.tokenizer.text_tokenizer.eos_token_id
        emb[pad] = emb[eos]
        params = dict(params)
        params["embed_tokens"] = jnp.asarray(emb)
        return params

    def prepare_batch(self, batch: Dict[str, Any],
                      max_length: Optional[int] = None) -> Dict[str, Any]:
        """batch: {"samples": dict-of-lists} from a data-layer collater ->
        arrays for libra_tpu.training.trainer.train_step."""
        samples = batch["samples"]
        inputs = self.tokenizer(
            [samples], padding="longest", truncation=True,
            max_length=max_length)
        labels = build_labels(
            inputs["input_ids"], inputs["attention_mask"],
            samples["label_mask_position_map"],
            boi_token_id=self.tokenizer.image_tokenizer.boi_token_id,
            bos_token_id=self.tokenizer.text_tokenizer.bos_token_id)
        return {
            "input_ids": np.asarray(inputs["input_ids"]),
            "attention_mask": np.asarray(inputs["attention_mask"]),
            "vision_indices": np.asarray(inputs["vision_indices"]),
            "coninous_signal": inputs["coninous_signal"],
            "labels": labels,
        }
