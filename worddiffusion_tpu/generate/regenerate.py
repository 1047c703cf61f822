"""OCR-filtered dataset regeneration — the main inference pipeline.

Rebuild of ``regenerateFromtrain2.py`` (SURVEY.md §3.3), TPU-first:

- **Resumable**: the output directory is scanned once and already
  generated (image, writer, word) crops are skipped
  (``regenerateFromtrain2.py:177-237``).
- **Skip-step sampling**: the denoiser runs only on the reference's
  call schedule (~121 of 599 steps) with the deterministic update —
  one compiled ``lax.scan``, skipped steps cost no UNet FLOPs.
- **Writer-id perturbation** (``sidChange``, ``:767-794``): optionally
  offset writer ids to synthesise style variants.
- **Host/device overlap**: pipelined dispatch — up to ``queue_depth``
  batches are dispatched asynchronously (no host sync) before the host
  drains the oldest one (OCR filter + PNG writes) while the device
  keeps sampling; the sync (``np.asarray``) happens ``queue_depth``
  batches late.
- **OCR accept filter**: greedy CTC decode of the generated image must
  exactly match the conditioning word (``:896-967``); accept-rate is
  logged per batch.
- Cooperative stop via a flagGen-style file (``:523-529``).
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.alphabets import OCR_ENG
from ..data.gt import Sample
from ..ops.ctc import collapse_and_decode, greedy_frame_ids
from ..utils.images import regen_filename, save_single_images
from ..utils.stop_flag import StopFlag
from .sample import WordSampler

log = logging.getLogger("worddiffusion")


@dataclass
class RegenStats:
    generated: int = 0
    accepted: int = 0
    skipped_existing: int = 0

    @property
    def accept_rate(self) -> float:
        return self.accepted / max(self.generated, 1)


def scan_existing(out_dir: str) -> set:
    if not os.path.isdir(out_dir):
        return set()
    return set(os.listdir(out_dir))


def scan_history(out_dir: str, prior_dirs: Sequence[str] = ()) -> set:
    """Already-generated crop filenames across the output dir AND a
    history of previous dump folders.

    The reference resumes against whichever *previous* dump folder the
    author pointed the loader at (the commented stack of dumpPaths,
    ``regenerateFromtrain2.py:676-704``, scanned at ``:177-202``) — so a
    run whose output moved to a fresh directory still skips everything
    generated before. ``prior_dirs`` entries may be globs
    (``runs/regen_*``); non-existent paths are ignored like the
    reference's ``os.path.isdir`` guard."""
    import glob as _glob

    existing = scan_existing(out_dir)
    for pattern in prior_dirs:
        dirs = _glob.glob(pattern) or [pattern]
        for d in dirs:
            existing |= scan_existing(d)
    return existing


class Regenerator:
    def __init__(
        self,
        sampler: WordSampler,
        ocr_apply=None,                  # (images [B,H,W,1]) -> logits [B,T,K]
        ocr_alphabet: str = OCR_ENG,
        out_dir: str = "./regen",
        writer_lookup=None,              # raw writer str -> dense id
        sid_change: int = 0,
        stop_flag: Optional[str] = None,
        keep_rejected: bool = False,
        prior_dirs: Sequence[str] = (),
        queue_depth: int = 2,
    ):
        # For the fast fused-OCR path (only uint8 images + int frame-ids
        # cross the device->host link), construct the WordSampler with
        # ``ocr_apply=...``; the Regenerator never mutates a sampler it
        # didn't build — ``ocr_apply`` here is only the host-side
        # fallback filter for samplers without fusion.
        self.sampler = sampler
        self.ocr_apply = ocr_apply
        self.ocr_alphabet = ocr_alphabet
        self.out_dir = out_dir
        self.writer_lookup = writer_lookup or (lambda w: int(w) if str(w).isdigit() else 0)
        self.sid_change = sid_change
        self.stop = StopFlag(stop_flag)
        self.keep_rejected = keep_rejected
        self.prior_dirs = tuple(prior_dirs)
        # in-flight dispatched batches before the host drains one.
        # Depth 2 absorbs host-side jitter (PNG bursts, tunnel reads)
        # that depth-1 double buffering exposes: measured 98.3 vs 97.5
        # imgs/s at the flagship shape (BENCHMARKS.md round-4 pipeline
        # decomposition).
        self.queue_depth = max(1, queue_depth)

    def _filter_words(self, images: np.ndarray) -> list[str]:
        """Decode generated images with the frozen OCR (channel 0,
        like the reference ``callOCR``). Fallback path for samplers
        without fused OCR (the fused path ships frame-ids directly)."""
        gray = images[..., :1].astype(np.float32)
        gray = gray / 127.5 - 1.0 if images.dtype == np.uint8 else gray * 2.0 - 1.0
        logits = self.ocr_apply(jnp.asarray(gray))
        frames = np.asarray(greedy_frame_ids(logits))
        return collapse_and_decode(frames, self.ocr_alphabet)

    def run(
        self,
        samples: Sequence[Sample],
        batch_size: int = 64,
        rng: Optional[jax.Array] = None,
        max_batches: Optional[int] = None,
    ) -> RegenStats:
        rng = jax.random.PRNGKey(0) if rng is None else rng
        os.makedirs(self.out_dir, exist_ok=True)
        existing = scan_history(self.out_dir, self.prior_dirs)
        stats = RegenStats()

        todo = []
        for s in samples:
            name = regen_filename(s.image, s.writer, s.word)
            if name in existing:
                stats.skipped_existing += 1
            else:
                todo.append((s, name))
        log.info(
            "regen: %d to generate, %d already present", len(todo), stats.skipped_existing
        )

        def batches():
            for start in range(0, len(todo), batch_size):
                chunk = todo[start : start + batch_size]
                n_real = len(chunk)
                while len(chunk) < batch_size:  # pad to static shape
                    chunk = chunk + chunk[: batch_size - len(chunk)]
                yield chunk, n_real

        from collections import deque

        pending = deque()  # (on-device images, chunk, n_real)
        for bi, (chunk, n_real) in enumerate(batches()):
            if max_batches is not None and bi >= max_batches:
                break
            if self.stop.should_stop():
                log.info("flagGen stop raised; ending regen")
                break
            words = [s.word for s, _ in chunk]
            wids = np.asarray(
                [self.writer_lookup(s.writer) for s, _ in chunk], np.int32
            )
            if self.sid_change:
                wids = wids + self.sid_change
            phosc = None
            if self.sampler.exp.unet.use_phosc:
                from ..data.phosc import phosc_vector

                phosc = np.stack([
                    phosc_vector(w, self.sampler.exp.data.phos_version, as_int=True)
                    for w in words
                ]).astype(np.int32)
            # pipelined dispatch: keep up to queue_depth batches in
            # flight on the device, then drain the oldest on the host
            # (OCR filter + PNG writes) while the device keeps sampling
            out = self.sampler.sample_async(
                words, wids, jax.random.fold_in(rng, bi), phosc
            )
            pending.append((out, chunk, n_real))
            if len(pending) > self.queue_depth:
                self._drain(pending.popleft(), stats)
            if (bi + 1) % 10 == 0:
                log.info(
                    "regen batch %d: accept-rate %.3f (%d/%d)",
                    bi, stats.accept_rate, stats.accepted, stats.generated,
                )
        while pending:
            self._drain(pending.popleft(), stats)
        log.info(
            "regen done: %d generated, %d accepted (%.3f), %d pre-existing",
            stats.generated, stats.accepted, stats.accept_rate, stats.skipped_existing,
        )
        return stats

    def _drain(self, pending, stats: RegenStats) -> None:
        """Sync one dispatched batch to host and post-process it."""
        out, chunk, n = pending
        if isinstance(out, tuple):  # fused OCR: (uint8 images, frame ids)
            images, ids = out
            self._process(
                np.asarray(images)[:n], chunk[:n], stats,
                frame_ids=np.asarray(ids)[:n],
            )
        else:
            self._process(np.asarray(out)[:n], chunk[:n], stats)

    def _process(
        self, images: np.ndarray, chunk, stats: RegenStats, frame_ids=None
    ) -> None:
        stats.generated += len(chunk)
        if frame_ids is not None:
            decoded = collapse_and_decode(frame_ids, self.ocr_alphabet)
            keep = [i for i, ((s, _), d) in enumerate(zip(chunk, decoded)) if d == s.word]
        elif self.ocr_apply is not None:
            decoded = self._filter_words(images)
            keep = [i for i, ((s, _), d) in enumerate(zip(chunk, decoded)) if d == s.word]
        else:
            keep = list(range(len(chunk)))
        stats.accepted += len(keep)
        if keep:
            save_single_images(
                images[keep], [chunk[i][1] for i in keep], self.out_dir
            )
        if self.keep_rejected:
            rej = [i for i in range(len(chunk)) if i not in set(keep)]
            if rej:
                save_single_images(
                    images[rej], [chunk[i][1] for i in rej],
                    os.path.join(self.out_dir, "rejected"),
                )
