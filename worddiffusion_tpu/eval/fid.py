"""FID harness.

The driver target is "FID within 5% of the PyTorch reference"
(BASELINE.md). Classic FID uses an InceptionV3 trained on ImageNet;
those weights cannot be fetched in this environment, so the harness is
feature-extractor-pluggable: any ``apply_fn(images)->[B, D]`` works
(the in-repo ``StyleEncoder`` or the PHOSCNet trunk by default, or an
Inception port when its weights are available on disk). FID math
(Frechet distance between feature Gaussians) is exact.
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
