"""FID harness.

The driver target is "FID within 5% of the PyTorch reference"
(BASELINE.md). FID math (Frechet distance between feature Gaussians)
is exact; the featurizer is pluggable, in documented preference order:

1. **InceptionV3** (``eval/inception.py``): classic FID when a
   torchvision-layout weights file exists on disk
   (``cli.evaluate --inception_weights``). The port + converter are
   parity-proven; the ImageNet weights themselves cannot be fetched in
   this environment (zero egress).
2. **PHOSCNet trunk** (:func:`phosc_featurizer`): the DEFAULT protocol
   here — TPP features of the in-repo trained recognizer
   (``runs/phosc_syn/best_params.pkl``). Domain-specific (handwriting),
   stable scale across runs, and trained — unlike a random-init
   encoder. Not comparable to published Inception-FID numbers; use for
   relative comparisons (e.g. OCR-filtered vs unfiltered regen).
3. **StyleEncoder (random init)**: last resort, relative-only, warned.
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np
from scipy import linalg


def gaussian_stats(feats: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def compute_features(
    apply_fn: Callable[[np.ndarray], np.ndarray],
    batches: Iterable[np.ndarray],
) -> np.ndarray:
    out = [np.asarray(apply_fn(b)) for b in batches]
    return np.concatenate(out, axis=0)


def fid_score(
    real_feats: np.ndarray, fake_feats: np.ndarray
) -> float:
    return frechet_distance(*gaussian_stats(real_feats), *gaussian_stats(fake_feats))


def phosc_featurizer(
    params_path: str, language: str = "eng", trunk: str = "vgg",
):
    """Trained-PHOSCNet TPP-feature extractor — the default FID
    protocol. ``apply_fn(images [B,H,W,3] in [-1,1]) -> [B, D]``;
    inputs are resized to the recognizer's 50x250 on host."""
    import pickle

    import jax
    import jax.numpy as jnp

    from ..data.alphabets import phoc_dim, phos_dim
    from ..models.phoscnet import PHOSCNet
    from ..utils.images import resize_and_pad

    with open(params_path, "rb") as f:
        params = pickle.load(f)
    net = PHOSCNet(
        phos_size=phos_dim(language), phoc_size=phoc_dim(language), trunk=trunk,
    )
    fn = jax.jit(
        lambda im: net.apply(params, im, return_features=True)["features"]
    )

    def apply_fn(images: np.ndarray) -> np.ndarray:
        images = np.asarray(images)
        if images.shape[1:3] != (50, 250):
            images = np.stack([
                resize_and_pad(
                    ((c + 1.0) / 2.0 * 255.0).astype(np.uint8), 50, 250
                ).astype(np.float32) / 127.5 - 1.0
                for c in images
            ])
        return np.asarray(fn(jnp.asarray(images)))

    return apply_fn
