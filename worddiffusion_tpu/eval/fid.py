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
    """Exact FID from raw feature matrices WITHOUT forming [D, D]
    covariances. With sample covariances S1 = Y'Y/(n1-1),
    S2 = X'X/(n2-1) (Y, X mean-centered), the nonzero eigenvalues of
    S1·S2 equal the squared singular values of X·Y'/sqrt((n1-1)(n2-1))
    (cyclic permutation), so

        tr((S1·S2)^0.5) = sum svdvals(X·Y') / sqrt((n1-1)(n2-1))

    — an [n2, n1] SVD instead of scipy.linalg.sqrtm on [D, D]. At the
    4096-d PHOSC features this is seconds vs ~10 minutes on this host,
    and numerically cleaner (sqrtm of the non-symmetric product drifts
    complex; singular values are nonnegative by construction)."""
    real_feats = np.asarray(real_feats, np.float64)
    fake_feats = np.asarray(fake_feats, np.float64)
    n1, n2 = len(real_feats), len(fake_feats)
    if min(n1, n2) < 2:
        raise ValueError("FID needs >=2 samples per side")
    mu1 = real_feats.mean(axis=0)
    mu2 = fake_feats.mean(axis=0)
    y = real_feats - mu1
    x = fake_feats - mu2
    diff = mu1 - mu2
    tr1 = float((y * y).sum()) / (n1 - 1)   # tr(S1)
    tr2 = float((x * x).sum()) / (n2 - 1)   # tr(S2)
    cross = x @ y.T / np.sqrt((n1 - 1) * (n2 - 1))
    tr_covmean = float(np.linalg.svd(cross, compute_uv=False).sum())
    return float(diff @ diff + tr1 + tr2 - 2.0 * tr_covmean)


def phosc_resize(images: np.ndarray) -> np.ndarray:
    """[-1,1] float images at any HxW -> the recognizer's 50x250,
    still [-1,1] (shared by the FID featurizer and the ZSL path in
    ``cli/evaluate`` so the two can never drift)."""
    from ..utils.images import resize_and_pad

    images = np.asarray(images)
    if images.shape[1:3] != (50, 250):
        images = np.stack([
            resize_and_pad(
                ((c + 1.0) / 2.0 * 255.0).astype(np.uint8), 50, 250
            ).astype(np.float32) / 127.5 - 1.0
            for c in images
        ])
    return images


def load_phosc_net(params_path: str, language: str = "eng", trunk: str = "vgg"):
    """-> (jitted ``im [B,50,250,3] -> {'phos','phoc','features'}``,
    params). One pickle load + one compiled program shared by every
    PHOSC-based metric."""
    import pickle

    import jax

    from ..data.alphabets import phoc_dim, phos_dim
    from ..models.phoscnet import PHOSCNet

    with open(params_path, "rb") as f:
        params = pickle.load(f)
    net = PHOSCNet(
        phos_size=phos_dim(language), phoc_size=phoc_dim(language), trunk=trunk,
    )
    return jax.jit(lambda im: net.apply(params, im, return_features=True)), params


def phosc_featurizer(
    params_path: str, language: str = "eng", trunk: str = "vgg",
):
    """Trained-PHOSCNet TPP-feature extractor — the default FID
    protocol. ``apply_fn(images [B,H,W,3] in [-1,1]) -> [B, D]``;
    inputs are resized to the recognizer's 50x250 on host."""
    import jax.numpy as jnp

    fn, _ = load_phosc_net(params_path, language, trunk)

    def apply_fn(images: np.ndarray) -> np.ndarray:
        return np.asarray(fn(jnp.asarray(phosc_resize(images)))["features"])

    return apply_fn
