"""Joint text+image tokenization.

Re-implements the LibraTokenizer contract (reference:
tokenization_libra.py:109-399 and image_tokenizer.py:12-133):

  tokenizer(samples) -> {input_ids (Q, B, N), attention_mask (B, N),
                         vision_indices (B, N), coninous_signal (B, N, C)}

* text runs host-side through a pluggable text tokenizer (HF LLaMA fast
  tokenizer for real checkpoints, a tiny in-repo tokenizer for tests);
* images run device-side through the jitted VQGAN encode;
* vision ids are offset by the text vocab size; each image becomes
  <BOI> + g*g tokens + <EOI> (578 for 24x24), scattered into the
  `<img_ph>` placeholder positions of the text;
* `vision_indices` gives each token its index inside its image block
  (0..577), and max_vision_token_length (578) for text tokens;
* `coninous_signal` carries the raw CLIP features, with zero rows at
  BOI/EOI and zeroed entirely for samples flagged contiguous_ignore
  (t2i samples; reference: tokenization_libra.py:278-294).

The misspelled key "coninous_signal" is preserved for API parity.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from libra_tpu.config import VQGANConfig
from libra_tpu.models import vqgan as vqgan_model

MAX_TOKEN_LENGTH = 2048  # reference: tokenization_libra.py:15

IMG_PH = "<img_ph>"
IMG_GEN = "<img_gen>"


# ---------------------------------------------------------------------------
# Text tokenizers
# ---------------------------------------------------------------------------

class Encoding:
    """Single-text encoding with char->token mapping, the surface the data
    layer's label masking needs (reference label-span construction uses HF
    fast-tokenizer char_to_token: laion_dataset.py:178-241,
    instruction_dataset.py:262-326)."""

    def __init__(self, ids: List[int], char_spans: List[Optional[tuple]]):
        self.ids = ids
        self._spans = char_spans  # per token: (start, end) or None (specials)

    @property
    def length(self) -> List[int]:
        return [len(self.ids)]

    def char_to_token(self, char_index: int) -> Optional[int]:
        for t, span in enumerate(self._spans):
            if span is not None and span[0] <= char_index < span[1]:
                return t
        return None


class SimpleTextTokenizer:
    """Minimal whitespace tokenizer with the LibraTextTokenizer surface, for
    tests and offline use. Special ids mimic LLaMA: pad=unk=0, bos=1, eos=2."""

    def __init__(self, vocab: Optional[Dict[str, int]] = None,
                 vocab_size: int = 256, model_max_length: int = MAX_TOKEN_LENGTH):
        self.base_vocab_size = vocab_size
        self.vocab = dict(vocab or {})
        self.unk_token_id = 0
        self.pad_token_id = 0       # pad = unk (tokenization_libra.py:142)
        self.bos_token_id = 1
        self.eos_token_id = 2
        self.model_max_length = model_max_length
        self.img_ph_token_id = vocab_size - 2
        self.img_gen_token_id = vocab_size - 1
        self.add_bos_token = True
        self.add_eos_token = False
        self.padding_side = "right"
        self._next_id = 3

    @property
    def vocab_size(self) -> int:
        return self.base_vocab_size

    def _word_id(self, w: str) -> int:
        if w == IMG_PH:
            return self.img_ph_token_id
        if w == IMG_GEN:
            return self.img_gen_token_id
        if w not in self.vocab:
            self._next_id += 1
            self.vocab[w] = 3 + self._next_id % (self.base_vocab_size - 8)
        return self.vocab[w]

    def encode_one(self, text: str) -> List[int]:
        return self.encode_with_spans(text).ids

    def encode_with_spans(self, text: str) -> Encoding:
        """Tokenize one string tracking each token's source char span.
        <img_ph>/<img_gen> are atomic."""
        import re
        ids: List[int] = []
        spans: List[Optional[tuple]] = []
        if self.add_bos_token:
            ids.append(self.bos_token_id)
            spans.append(None)
        pattern = re.compile(
            r"<img_ph>|<img_gen>|\S+?(?=<img_ph>|<img_gen>)|\S+")
        for m in pattern.finditer(text):
            ids.append(self._word_id(m.group(0)))
            spans.append((m.start(), m.end()))
        # stretch spans to cover inter-token whitespace (HF char_to_token
        # maps a whitespace char to the following token)
        for i in range(1, len(spans)):
            if spans[i] is None or spans[i - 1] is None:
                continue
            prev_end = spans[i - 1][1]
            if spans[i][0] > prev_end:
                spans[i] = (prev_end, spans[i][1])
        if self.add_eos_token:
            ids.append(self.eos_token_id)
            spans.append(None)
        return Encoding(ids, spans)

    def __call__(self, texts: Sequence[str], padding="longest",
                 **kw) -> Dict[str, np.ndarray]:
        seqs = [self.encode_one(t) for t in texts]
        n = max(len(s) for s in seqs)
        B = len(seqs)
        ids = np.full((B, n), self.pad_token_id, np.int32)
        mask = np.zeros((B, n), np.int32)
        for i, s in enumerate(seqs):
            if self.padding_side == "left":
                ids[i, n - len(s):] = s
                mask[i, n - len(s):] = 1
            else:
                ids[i, :len(s)] = s
                mask[i, :len(s)] = 1
        return {"input_ids": ids, "attention_mask": mask,
                "length": np.array([len(s) for s in seqs])}

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True,
               **kw) -> str:
        inv = {v: k for k, v in self.vocab.items()}
        inv[self.img_ph_token_id] = IMG_PH
        out = []
        for i in ids:
            i = int(i)
            if skip_special_tokens and i in (self.pad_token_id,
                                             self.bos_token_id,
                                             self.eos_token_id):
                continue
            out.append(inv.get(i, f"<{i}>"))
        return " ".join(out)


class HFTextTokenizer:
    """LLaMA fast tokenizer with Libra's added tokens
    (reference: tokenization_libra.py:135-146)."""

    def __init__(self, pretrained_model_path: str, **kwargs):
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(pretrained_model_path,
                                            use_fast=True, **kwargs)
        tok.add_tokens(IMG_PH)
        tok.add_tokens(IMG_GEN)
        tok.pad_token = tok.unk_token
        self.tok = tok
        self.img_ph_token_id = tok.convert_tokens_to_ids(IMG_PH)
        self.img_gen_token_id = tok.convert_tokens_to_ids(IMG_GEN)

    def __getattr__(self, name):
        return getattr(self.tok, name)

    def __call__(self, texts, **kw):
        kw.setdefault("return_length", True)
        out = self.tok(list(texts), **kw)
        return {k: np.asarray(v) for k, v in out.items()}

    def encode_with_spans(self, text: str):
        """Delegate char_to_token to the HF fast encoding (exact reference
        semantics)."""
        enc = self.tok(text)

        class _HFEncoding:
            ids = enc["input_ids"]
            length = [len(enc["input_ids"])]

            @staticmethod
            def char_to_token(char_index: int):
                return enc.char_to_token(char_index)

        return _HFEncoding()

    def decode(self, ids, **kw):
        return self.tok.decode(ids, **kw)


# ---------------------------------------------------------------------------
# Image tokenizer
# ---------------------------------------------------------------------------

class ImageTokenizer:
    """VQGAN-backed image tokenizer with combined-vocab framing.

    Token layout (reference: image_tokenizer.py:44-49): codes occupy
    [offset, offset+codebook_size); BOI = offset + codebook_size;
    EOI = offset + codebook_size + 1. vocab_size = codebook_size + 2.
    """

    def __init__(self, cfg: VQGANConfig, params: Dict, token_offset: int,
                 max_vision_token_length: int = 578,
                 downsample_ratio: Optional[int] = None):
        self.cfg = cfg
        self.params = params
        self.offset = token_offset
        self.codebook_size = cfg.codebook_size
        self.num_codebook = cfg.num_codebook
        self.vocab_size = cfg.codebook_size + 2
        self.boi_token_id = token_offset + self.vocab_size - 2
        self.eoi_token_id = token_offset + self.vocab_size - 1
        self.max_vision_token_length = max_vision_token_length
        self.downsample_ratio = downsample_ratio

        self._encode = jax.jit(functools.partial(
            vqgan_model.encode, cfg=self.cfg, training=False))
        self._decode = jax.jit(functools.partial(
            vqgan_model.decode_code, cfg=self.cfg))

    @staticmethod
    def infer_downsample_ratio(ckpt_path: str) -> Optional[int]:
        """Conv-encoder downsample ratio from the checkpoint filename
        (reference: image_tokenizer.py:28-35: `_f16_` / `_f8_` markers;
        None = fixed-size CLIP encoder)."""
        import os
        name = os.path.basename(str(ckpt_path))
        if "_f16_" in name and "_f8_" in name:
            raise ValueError(f"ambiguous downsample markers in {name!r}")
        if "_f16_" in name:
            return 16
        if "_f8_" in name:
            return 8
        return None

    def get_token_length(self, images=None) -> int:
        """Vision tokens an image occupies (grid**2 + BOI + EOI). With a
        conv encoder the grid follows the input resolution
        (reference: image_tokenizer.py:62-68)."""
        if self.downsample_ratio is None or images is None:
            return self.max_vision_token_length
        arr = np.asarray(images[0] if isinstance(images, (list, tuple))
                         else images)
        h, w = arr.shape[-3], arr.shape[-2]   # NHWC
        if h != w:
            raise ValueError("image tokenization requires square images")
        return (h // self.downsample_ratio) ** 2 + 2

    def encode(self, pixels: jax.Array) -> Dict[str, jax.Array]:
        """pixels: (B, S, S, 3) CLIP-normalized NHWC.

        Returns input_ids (Q, B, max_vision_token_length) int32 with
        offset+BOI/EOI framing, and encoder_feat (B, g*g, C).
        Reference: ImageTokenizer.encode (image_tokenizer.py:75-95).
        """
        _, _, indices, feat = self._encode(self.params, pixels=pixels)
        B, g, _, Q = indices.shape
        ids = indices.transpose(3, 0, 1, 2).reshape(Q, B, g * g) + self.offset
        boi = jnp.full((Q, B, 1), self.boi_token_id, ids.dtype)
        eoi = jnp.full((Q, B, 1), self.eoi_token_id, ids.dtype)
        ids = jnp.concatenate([boi, ids, eoi], axis=-1)
        feat = feat.reshape(B, g * g, -1)
        return {"input_ids": ids, "encoder_feat": feat}

    def decode(self, token_ids) -> Optional[jax.Array]:
        """token_ids: list over images of per-codebook id lists, or an
        (B, N, Q)-like array. Strips BOI/EOI, un-offsets, decodes to pixels
        (reference: image_tokenizer.py:97-124)."""
        if token_ids is None or len(token_ids) == 0:
            return None
        x = np.asarray(token_ids, np.int64)
        if x.ndim == 2:      # (Q, N) single image
            x = x[None]
        # x: (B, Q, N)
        if (x == self.boi_token_id).any():
            x = x[:, :, 1:-1]
        Bq, Q, N = x.shape
        g = int(round(N ** 0.5))
        if g * g != N:
            raise ValueError("image decode requires square token grids")
        x = x.reshape(Bq, Q, g, g).transpose(0, 2, 3, 1) - self.offset
        return self._decode(self.params, indices=jnp.asarray(x))


# ---------------------------------------------------------------------------
# Joint tokenizer
# ---------------------------------------------------------------------------

class LibraTokenizer:
    """Fuses text and image tokenization into decoder-ready arrays.

    Reference: LibraTokenizer (tokenization_libra.py:109-316).
    """

    def __init__(self, text_tokenizer, image_tokenizer: ImageTokenizer):
        self.text_tokenizer = text_tokenizer
        self.image_tokenizer = image_tokenizer
        self.num_codebook = image_tokenizer.num_codebook

    # -- encode ------------------------------------------------------------

    def __call__(self, samples, padding="longest", truncation=False,
                 max_length: Optional[int] = None,
                 **kw) -> Dict[str, Optional[np.ndarray]]:
        if not isinstance(samples, (list, tuple)):
            samples = [samples]
        texts: List[str] = []
        images: List[Any] = []
        ignore_signs: List[bool] = []
        has_image_flags: List[bool] = []
        for s in samples:
            lang = s.get("language")
            if lang is not None:
                texts += lang if isinstance(lang, (list, tuple)) else [lang]
            vis = s.get("vision")
            if vis is not None:
                images += list(vis) if isinstance(vis, (list, tuple)) else [vis]
            ig = s.get("contiguous_ignore_sign")
            if ig is not None:
                ignore_signs += list(ig) if isinstance(ig, (list, tuple)) else [ig]
            hi = s.get("has_image")
            if hi is not None:
                has_image_flags += list(hi) if isinstance(hi, (list, tuple)) else [hi]

        if not texts:
            raise ValueError("Empty text inputs")
        max_length = max_length or getattr(self.text_tokenizer,
                                           "model_max_length", MAX_TOKEN_LENGTH)

        t = self.text_tokenizer(texts, padding=padding, **kw)
        ids = np.asarray(t["input_ids"], np.int64)          # (B, N)
        mask = np.asarray(t["attention_mask"], np.int32)
        B, N = ids.shape
        Q = self.num_codebook
        M = self.image_tokenizer.max_vision_token_length

        img_ph_mask = ids == self.text_tokenizer.img_ph_token_id
        img_gen_mask = ids == self.text_tokenizer.img_gen_token_id
        ids[img_gen_mask] = self.image_tokenizer.boi_token_id

        input_ids = np.broadcast_to(ids[None], (Q, B, N)).copy()
        vision_indices = np.full((B, N), M, np.int64)
        signal = None

        if images:
            pixels = np.stack([np.asarray(im) for im in images])
            enc = self.image_tokenizer.encode(jnp.asarray(pixels))
            img_ids = np.asarray(enc["input_ids"])          # (Q, B', M)
            feat = np.asarray(enc["encoder_feat"])          # (B', M-2, C)
            if has_image_flags:
                keep = np.asarray(has_image_flags, bool)
                img_ids = img_ids[:, keep]
                feat = feat[keep]
            n_img = img_ids.shape[1]
            n_slots = int(img_ph_mask.sum())
            if n_slots != n_img * M:
                raise ValueError(
                    f"{n_slots} <img_ph> slots but {n_img} images x {M} tokens")
            input_ids[:, img_ph_mask] = img_ids.reshape(Q, -1)
            vision_indices[img_ph_mask] = np.tile(np.arange(M), n_img)

            C = feat.shape[-1]
            zero_row = np.zeros((n_img, 1, C), feat.dtype)
            framed = np.concatenate([zero_row, feat, zero_row], axis=1)
            if ignore_signs:
                framed[np.asarray(ignore_signs, bool)] = 0
            signal = np.zeros((B, N, C), feat.dtype)
            signal[img_ph_mask] = framed.reshape(-1, C)
        else:
            vision_indices[img_gen_mask] = 0

        if truncation:
            input_ids = input_ids[:, :, :max_length]
            mask = mask[:, :max_length]
            vision_indices = vision_indices[:, :max_length]
            if signal is not None:
                signal = signal[:, :max_length]

        return {
            "input_ids": input_ids,
            "attention_mask": mask,
            "vision_indices": vision_indices,
            "coninous_signal": signal,
        }

    # -- decode ------------------------------------------------------------

    def batch_decode(self, token_ids, **kw) -> List[Dict[str, Any]]:
        """token_ids: (Q, B, N) -> per-sample {'language', 'vision'}
        (reference: tokenization_libra.py:322-360)."""
        arr = np.asarray(token_ids)
        return [self.decode(arr[:, b], **kw) for b in range(arr.shape[1])]

    def decode(self, token_ids, **kw) -> Dict[str, Any]:
        per_codebook = [self._split_text_image(np.asarray(row))
                        for row in np.asarray(token_ids)]
        text_ids = per_codebook[0][0]
        # images: list over images of per-codebook token lists
        n_images = len(per_codebook[0][1])
        images = [[per_codebook[q][1][i] for q in range(len(per_codebook))]
                  for i in range(n_images)]
        decoded_text = self.text_tokenizer.decode(text_ids, **kw)
        decoded_image = (self.image_tokenizer.decode(images)
                         if n_images else None)
        return {"language": decoded_text, "vision": decoded_image}

    def _split_text_image(self, ids: np.ndarray):
        """Split a 1D id sequence at BOI/EOI pairs
        (reference: prepare_decode, tokenization_libra.py:362-399)."""
        boi = np.nonzero(ids == self.image_tokenizer.boi_token_id)[0]
        eoi = np.nonzero(ids == self.image_tokenizer.eoi_token_id)[0]
        if len(boi) != len(eoi):
            raise ValueError("Incomplete images found during decoding")
        if len(boi) == 0:
            return ids.tolist(), []
        text_ids: List[int] = []
        image_ids: List[List[int]] = []
        cur = 0
        for b, e in zip(boi, eoi):
            if e < b:
                raise ValueError("EOI occurs before BOI")
            text_ids += ids[cur:b].tolist()
            text_ids.append(self.text_tokenizer.img_ph_token_id)
            image_ids.append(ids[b:e + 1].tolist())
            cur = e + 1
        text_ids += ids[cur:-1].tolist()
        return text_ids, image_ids
