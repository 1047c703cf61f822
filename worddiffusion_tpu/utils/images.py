"""Host-side image utilities (numpy / PIL / cv2).

- ``resize_and_pad``: word crop -> fixed HxW canvas (the reference uses
  pre-processed 64x256 crops; this is the in-repo equivalent of that
  offline step).
- ``crop_whitespace``: Otsu bounding-box crop (``sampling.py:16-23``).
- ``center_on_canvas``: reference ``tensor_centered`` used before the
  OCR filter (``regenerateFromtrain2.py:880-888``).
- ``save_image_grid`` / ``save_single_images``: output writers with the
  reference's ``{img}_{writer}_{word}.png`` naming
  (``regenerateFromtrain2.py:861-873``).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
from PIL import Image


def resize_and_pad(
    img: np.ndarray, height: int = 64, width: int = 256, pad_value: int = 255
) -> np.ndarray:
    """uint8 HWC (or HW / HW1) -> [height, width, ...]: scale to target
    height (and down to target width if needed), right-pad with white."""
    squeeze = img.ndim == 3 and img.shape[2] == 1
    pil = Image.fromarray(img[..., 0] if squeeze else img)
    w, h = pil.size
    new_w = max(1, min(width, int(round(w * height / h))))
    pil = pil.resize((new_w, height), Image.BILINEAR)
    canvas = np.full((height, width) + img.shape[2:], pad_value, np.uint8)
    arr = np.asarray(pil)
    canvas[:, :new_w] = arr[..., None] if squeeze else arr
    return canvas


def normalize_to_unit(img: np.ndarray) -> np.ndarray:
    """uint8 -> float32 in [-1, 1] (ToTensor + Normalize(0.5, 0.5),
    ``trainModifyCondition.py:933-935``). uint8 input takes the native
    single-pass path (measured 5.5x over numpy on the 1-core host)."""
    if img.dtype == np.uint8:
        from ..data import native

        return native.batch_normalize(img)
    return (img.astype(np.float32) / 255.0 - 0.5) / 0.5


def denormalize_to_uint8(img: np.ndarray) -> np.ndarray:
    """float [0,1] HWC -> uint8 (uint8 passes through unchanged)."""
    if img.dtype == np.uint8:
        return img
    if img.dtype == np.float32:
        from ..data import native

        return native.batch_denormalize(img)
    return (np.clip(img, 0.0, 1.0) * 255.0).round().astype(np.uint8)


def crop_whitespace(img: np.ndarray) -> np.ndarray:
    """Otsu-threshold bounding-box crop of a grayscale word image
    (``sampling.py:16-23``)."""
    import cv2

    gray = img if img.ndim == 2 else cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    _, binarized = cv2.threshold(gray, 0, 255, cv2.THRESH_BINARY_INV | cv2.THRESH_OTSU)
    coords = cv2.findNonZero(binarized)
    if coords is None:
        return img
    x, y, w, h = cv2.boundingRect(coords)
    return img[y : y + h, x : x + w]


def center_on_canvas(
    imgs: np.ndarray, height: int, width: int, border_value: float = 0.0
) -> np.ndarray:
    """[B, h, w, C] float -> centered on [B, height, width, C] canvas
    (crop if larger), like the reference tensor_centered call."""
    b, h, w, c = imgs.shape
    out = np.full((b, height, width, c), border_value, imgs.dtype)
    sh = max(0, (h - height) // 2)
    sw = max(0, (w - width) // 2)
    ch = min(h, height)
    cw = min(w, width)
    dh = (height - ch) // 2
    dw = (width - cw) // 2
    out[:, dh : dh + ch, dw : dw + cw] = imgs[:, sh : sh + ch, sw : sw + cw]
    return out


def regen_filename(image_id: str, writer: str | int, word: str) -> str:
    """``{img}_{writer}_{word}.png`` naming of the regeneration output."""
    stem = os.path.splitext(image_id)[0]
    return f"{stem}_{writer}_{word}.png"


def save_single_images(
    images: np.ndarray, names: Sequence[str], out_dir: str
) -> list[str]:
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for img, name in zip(images, names):
        p = os.path.join(out_dir, name)
        # compress_level=1: ~3x faster PNG encode (the host-side write
        # loop overlaps device compute in the regen pipeline; keep it
        # off the critical path)
        Image.fromarray(denormalize_to_uint8(img)).save(p, compress_level=1)
        paths.append(p)
    return paths


def save_image_grid(images: np.ndarray, path: str, ncol: int = 8) -> None:
    """[B, H, W, C] float [0,1] -> one PNG grid (epoch preview,
    ``train.py:298-313``)."""
    b, h, w, c = images.shape
    ncol = min(ncol, b)
    nrow = (b + ncol - 1) // ncol
    grid = np.full((nrow * h, ncol * w, c), 255, np.uint8)
    for i in range(b):
        r, cl = divmod(i, ncol)
        grid[r * h : (r + 1) * h, cl * w : (cl + 1) * w] = denormalize_to_uint8(images[i])
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(grid.squeeze() if c == 1 else grid).save(path)
