"""Word-image dataset: samples -> model-ready records.

Replaces the reference's five copy-pasted ``IAMDataset`` classes
(``trainModifyCondition.py:224-478`` etc.) with one implementation:

- images load from ``image_dir`` (pre-cropped word PNG/JPG), are
  resize-padded to HxW and normalised to [-1, 1]
  (``trainModifyCondition.py:933-935``);
- missing files fall back to the synthetic renderer so the pipeline
  runs without the cluster-only IAM crops;
- ``latent_cache`` short-circuits image IO entirely, returning
  precomputed VAE latents (the ``vaeFromDict`` fast path,
  ``trainModifyCondition.py:303-325``);
- optional PHOSC int descriptors and OCR CTC targets per record;
- conditioning-mode batch keys: ``style_vec`` writer-style vectors from
  a style dict (``--wrdChrWrStyl``, ``trainModifyCondition.py:466-468``),
  ``char_images`` per-character glyph crops (``--charImages``,
  ``trainModifyCondition.py:406-446``), and ``cond_latents`` reference
  latents (``--imgConditioned``, the trainer's
  ``original_images=latents`` call, ``trainModifyCondition.py:733``).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import numpy as np

from ..configs.config import DataConfig
from ..utils.images import normalize_to_unit, resize_and_pad
from .gt import Sample, WriterRegistry
from .phosc import phosc_vector
from .synthetic import render_word, stable_seed
from .tokenizer import Tokenizer


def char_glyphs(
    word: str,
    max_chars: int,
    size: tuple,
    cache: Optional[dict] = None,
) -> np.ndarray:
    """[max_chars, gh, gw, 1] glyph crops in [-1, 1] (the charImages
    conditioning, ``trainModifyCondition.py:406-446``); unused slots
    stay white (+1). Shared by the training dataset and the sampling
    CLI so inference glyphs match the training renders exactly."""
    gh, gw = size
    cache = cache if cache is not None else {}
    slots = np.ones((max_chars, gh, gw, 1), np.float32)
    for i, c in enumerate(word[:max_chars]):
        if c not in cache:
            g = render_word(c, gh, gw, seed=0, jitter=False)
            g = normalize_to_unit(g).mean(axis=-1, keepdims=True)
            cache[c] = g.astype(np.float32)
        slots[i] = cache[c]
    return slots


class WordImageDataset:
    def __init__(
        self,
        samples: Sequence[Sample],
        registry: WriterRegistry,
        tokenizer: Tokenizer,
        cfg: DataConfig,
        use_phosc: bool = False,
        latent_cache: Optional["LatentLookup"] = None,
        augment_fn: Optional[Callable] = None,
        ocr_alphabet: Optional[str] = None,
        style_lookup: Optional[dict] = None,
        char_images: bool = False,
        char_image_size: tuple = (16, 16),
        cond_latents: bool = False,
        seed: int = 0,
        writer_styled: bool = False,
    ):
        """Conditioning-mode sources:

        ``writer_styled``: synthetic fallback renders use the writer's
        deterministic style (``synthetic.writer_style``) so the corpus
        carries a writer-consistent signal — required for style-encoder
        / ``--wrdChrWrStyl`` training, where per-image jitter alone has
        nothing to condition on.

        ``style_lookup``: raw writer id -> style vector (built by
        ``models.style.build_style_dict``, the in-repo
        ``cropStyleDict_Numpy.pkl``); emits ``style_vec``.
        ``char_images``: emit per-character glyph crops
        [max_chars, gh, gw, 1] in [-1, 1], white-padded.
        ``cond_latents``: emit the record's own clean latent (or image in
        pixel mode) as the conditioning reference, matching the
        trainer's ``original_images=latents``
        (``trainModifyCondition.py:733``)."""
        self.samples = list(samples)
        self.registry = registry
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.use_phosc = use_phosc
        self.latent_cache = latent_cache
        self.augment_fn = augment_fn
        self.ocr_alphabet = ocr_alphabet
        self.style_lookup = style_lookup
        self.char_images = char_images
        self.char_image_size = tuple(char_image_size)
        self.cond_latents = cond_latents
        self.writer_styled = writer_styled
        self._rng = np.random.default_rng(seed)
        self._phosc_cache: dict[str, np.ndarray] = {}
        self._glyph_cache: dict[str, np.ndarray] = {}

    def __len__(self) -> int:
        return len(self.samples)

    def _load_image(self, sample: Sample) -> np.ndarray:
        path = os.path.join(self.cfg.image_dir, sample.image) if self.cfg.image_dir else ""
        if path and os.path.exists(path):
            from PIL import Image

            img = np.asarray(Image.open(path).convert("RGB"))
        else:
            style = None
            if self.writer_styled:
                from .synthetic import writer_style

                style = writer_style(sample.writer)
            img = render_word(
                sample.word, self.cfg.img_height, self.cfg.img_width,
                seed=stable_seed(sample.image), style=style,
            )
        if img.shape[:2] != (self.cfg.img_height, self.cfg.img_width):
            img = resize_and_pad(img, self.cfg.img_height, self.cfg.img_width)
        if self.augment_fn is not None:
            img = self.augment_fn(img, self._rng)
        return img

    def _phosc(self, word: str) -> np.ndarray:
        if word not in self._phosc_cache:
            self._phosc_cache[word] = phosc_vector(
                word, self.cfg.phos_version, as_int=True
            ).astype(np.int32)
        return self._phosc_cache[word]

    def _char_glyphs(self, word: str) -> np.ndarray:
        return char_glyphs(
            word, self.cfg.max_chars, self.char_image_size, self._glyph_cache
        )

    def __getitem__(self, idx: int) -> dict:
        s = self.samples[idx]
        rec = {
            "image_name": s.image,
            "word": s.word,
            "context": self.tokenizer.encode(s.word),
            "writer": np.int32(self.registry[s.writer] if s.writer in self.registry else 0),
        }
        if self.latent_cache is not None and s.image in self.latent_cache:
            rec["latent"] = self.latent_cache[s.image]
        else:
            rec["image"] = normalize_to_unit(self._load_image(s))
        if self.use_phosc:
            rec["phosc"] = self._phosc(s.word)
        if self.style_lookup is not None:
            if s.writer not in self.style_lookup:
                raise KeyError(
                    f"style_lookup has no vector for writer {s.writer!r} "
                    "(build one with models.style.build_style_dict over this "
                    "corpus before enabling --wrdChrWrStyl)"
                )
            rec["style_vec"] = np.asarray(self.style_lookup[s.writer], np.float32)
        if self.char_images:
            rec["char_images"] = self._char_glyphs(s.word)
        if self.cond_latents:
            rec["cond_latents"] = rec["latent"] if "latent" in rec else rec["image"]
        if self.ocr_alphabet is not None:
            from ..ops.ctc import encode_ocr_labels

            ids, lens = encode_ocr_labels([s.word], self.ocr_alphabet, self.cfg.max_chars)
            rec["ocr_ids"] = ids[0]
            rec["ocr_len"] = lens[0]
        return rec


class LatentLookup:
    """image name -> precomputed VAE latent (in-repo replacement for the
    reference's cluster pickles ``imageWordLineVae3.pkl``)."""

    def __init__(self, arrays: dict[str, np.ndarray]):
        self._arrays = arrays

    def __contains__(self, name: str) -> bool:
        return name in self._arrays

    def __getitem__(self, name: str) -> np.ndarray:
        return self._arrays[name]

    def __len__(self) -> int:
        return len(self._arrays)

    @classmethod
    def load(cls, path: str) -> "LatentLookup":
        with np.load(path, allow_pickle=False) as z:
            return cls({k: z[k] for k in z.files})

    @classmethod
    def build(
        cls, names: Sequence[str], latents: np.ndarray, path: Optional[str] = None
    ) -> "LatentLookup":
        arrays = {n: latents[i] for i, n in enumerate(names)}
        if path:
            np.savez_compressed(path, **arrays)
        return cls(arrays)
