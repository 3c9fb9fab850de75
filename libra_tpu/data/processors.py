"""Host-side data processors.

Behavior-parity with the reference processors
(libra/data/processors/libra_processor.py:65-171): CLIP image preprocessing
(resize shortest-edge 336 bicubic -> center-crop -> rescale -> normalize),
optional expand-to-square padding with the CLIP-mean background, and the
caption cleaner (html strip, punctuation squashing, whitespace collapse,
max-words truncation).

Images are returned NHWC float32, already CLIP-normalized, ready for the
device-side tokenizer.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

import numpy as np

from libra_tpu.config import CLIPVisionConfig
from libra_tpu.registry import registry

try:
    from PIL import Image
    HAS_PIL = True
except Exception:  # pragma: no cover
    HAS_PIL = False


def expand2square(img: "Image.Image",
                  background_color=(0, 0, 0)) -> "Image.Image":
    """Pad to square, centering (reference: laion_dataset.py:38-49)."""
    w, h = img.size
    if w == h:
        return img
    side = max(w, h)
    out = Image.new(img.mode, (side, side), background_color)
    out.paste(img, ((side - w) // 2, (side - h) // 2))
    return out


class LibraImageProcessor:
    """CLIP preprocessing on PIL images -> (S, S, 3) float32 normalized.

    Matches CLIPImageProcessor.preprocess semantics
    (reference: clip/image_processing_clip.py:219-337): resize shortest
    edge to S with PIL bicubic, center crop S, scale 1/255, normalize.
    """

    name = "libra_image"

    def __init__(self, clip_cfg: Optional[CLIPVisionConfig] = None,
                 pad_to_square: bool = False):
        self.cfg = clip_cfg or CLIPVisionConfig()
        self.pad_to_square = pad_to_square

    @property
    def image_mean(self):
        return self.cfg.image_mean

    @property
    def image_std(self):
        return self.cfg.image_std

    @property
    def background_color(self) -> Tuple[int, int, int]:
        return tuple(int(x * 255) for x in self.cfg.image_mean)

    def __call__(self, img) -> np.ndarray:
        S = self.cfg.image_size
        if isinstance(img, np.ndarray):
            if img.ndim == 3 and img.shape[-1] == 3 and img.shape[0] != 3:
                img = Image.fromarray(img.astype(np.uint8))
            else:
                raise ValueError("expected HWC uint8 array or PIL image")
        if self.pad_to_square:
            img = expand2square(img, self.background_color)
        w, h = img.size
        # HF get_resize_output_image_size semantics (TRUNCATED long edge;
        # reference: clip/image_processing_clip.py resize path) -- round()
        # here would shift the whole resample grid by one pixel
        short, long = (w, h) if w <= h else (h, w)
        new_long = int(S * long / short)
        nw, nh = (S, new_long) if w <= h else (new_long, S)
        img = img.resize((nw, nh), Image.BICUBIC)
        left, top = (nw - S) // 2, (nh - S) // 2
        img = img.crop((left, top, left + S, top + S))
        x = np.asarray(img.convert("RGB"), np.float32) / 255.0
        mean = np.asarray(self.cfg.image_mean, np.float32)
        std = np.asarray(self.cfg.image_std, np.float32)
        return (x - mean) / std

    @classmethod
    def from_config(cls, cfg=None):
        cfg = cfg or {}
        clip_cfg = None
        if "image_size" in cfg:
            import dataclasses
            clip_cfg = dataclasses.replace(CLIPVisionConfig(),
                                           image_size=cfg["image_size"])
        return cls(clip_cfg=clip_cfg,
                   pad_to_square=cfg.get("pad_to_square", False))


class LibraEvalImageProcessor(LibraImageProcessor):
    """Eval-time variant: always expand-to-square with CLIP-mean background
    (reference: libra_processor.py:65-89)."""

    name = "libra_image_eval"

    def __init__(self, clip_cfg: Optional[CLIPVisionConfig] = None):
        super().__init__(clip_cfg, pad_to_square=True)

    @classmethod
    def from_config(cls, cfg=None):
        return cls()


_HTML_RE = re.compile(r"<[^>]+>")


class LibraCaptionProcessor:
    """Caption cleanup (reference: libra_processor.py:117-171)."""

    name = "libra_caption"

    def __init__(self, prompt: str = "", max_words: int = 256,
                 lowercase: bool = False, remove_html: bool = True):
        self.prompt = prompt
        self.max_words = max_words
        self.lowercase = lowercase
        self.remove_html = remove_html

    def __call__(self, caption: str) -> str:
        c = caption
        if self.remove_html:
            c = _HTML_RE.sub(" ", c)
        c = re.sub(r"([*#~])", " ", c)
        c = re.sub(r"\s{2,}", " ", c).strip()
        if self.lowercase:
            c = c.lower()
        words = c.split(" ")
        if len(words) > self.max_words:
            c = " ".join(words[:self.max_words])
        return self.prompt + c

    @classmethod
    def from_config(cls, cfg=None):
        cfg = cfg or {}
        return cls(prompt=cfg.get("prompt", ""),
                   max_words=cfg.get("max_words", 256),
                   lowercase=cfg.get("lowercase", False),
                   remove_html=cfg.get("remove_html", True))


registry.register_processor("libra_image")(LibraImageProcessor)
registry.register_processor("libra_image_eval")(LibraEvalImageProcessor)
registry.register_processor("libra_caption")(LibraCaptionProcessor)
