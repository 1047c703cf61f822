"""Host-side augmentation ops (numpy / PIL / cv2).

Rebuilds the reference augmentation inventory without the timm /
torchvision dependencies:

- noise / shear_x / shear_y / erode / dilate / sharpness / blur /
  random_perspective / random_erase
  (``ResPhoSCNetZSL/dataset_manipulation/augmentation.py:15-89``),
- vertical white "eraser" lines — the reference's crude corruption /
  fault-injection augmentation ``dump_images``
  (``trainModifyCondition.py:125-156``),
- small random rotation (``--augMaps`` RandomRotation(-3, 3),
  ``trainModifyCondition.py:630``).

All ops are uint8-HWC in/out and take an explicit ``rng`` so the input
pipeline stays reproducible.
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter


def _to_pil(img: np.ndarray) -> Image.Image:
    return Image.fromarray(img)


def _to_np(img: Image.Image) -> np.ndarray:
    return np.asarray(img)


def noise(img: np.ndarray, rng: np.random.Generator, variability: float = 25.0) -> np.ndarray:
    deviation = variability * rng.random()
    out = img.astype(np.int32) + rng.normal(0, deviation, img.shape).astype(np.int32)
    return np.clip(out, 0, 255).astype(np.uint8)


def shear_x(img: np.ndarray, factor: float) -> np.ndarray:
    pil = _to_pil(img)
    return _to_np(
        pil.transform(pil.size, Image.AFFINE, (1, factor, 0, 0, 1, 0), fillcolor=255)
    )


def shear_y(img: np.ndarray, factor: float) -> np.ndarray:
    pil = _to_pil(img)
    return _to_np(
        pil.transform(pil.size, Image.AFFINE, (1, 0, 0, factor, 1, 0), fillcolor=255)
    )


def erode(img: np.ndarray, cycles: int = 1) -> np.ndarray:
    pil = _to_pil(img)
    for _ in range(cycles):
        pil = pil.filter(ImageFilter.MinFilter(3))
    return _to_np(pil)


def dilate(img: np.ndarray, cycles: int = 1) -> np.ndarray:
    pil = _to_pil(img)
    for _ in range(cycles):
        pil = pil.filter(ImageFilter.MaxFilter(3))
    return _to_np(pil)


def sharpness(img: np.ndarray, factor: float) -> np.ndarray:
    return _to_np(ImageEnhance.Sharpness(_to_pil(img)).enhance(factor))


def blur(img: np.ndarray, radius: float) -> np.ndarray:
    return _to_np(_to_pil(img).filter(ImageFilter.GaussianBlur(radius=radius)))


def rotate(img: np.ndarray, rng: np.random.Generator, max_deg: float = 3.0) -> np.ndarray:
    deg = float(rng.uniform(-max_deg, max_deg))
    return _to_np(_to_pil(img).rotate(deg, resample=Image.BILINEAR, fillcolor=255))


def random_perspective(
    img: np.ndarray, rng: np.random.Generator, distortion: float = 0.5
) -> np.ndarray:
    import cv2

    h, w = img.shape[:2]
    dx = distortion * w / 2
    dy = distortion * h / 2
    src = np.float32([[0, 0], [w, 0], [w, h], [0, h]])
    dst = src + np.float32(
        [[rng.uniform(0, dx), rng.uniform(0, dy)],
         [-rng.uniform(0, dx), rng.uniform(0, dy)],
         [-rng.uniform(0, dx), -rng.uniform(0, dy)],
         [rng.uniform(0, dx), -rng.uniform(0, dy)]]
    )
    m = cv2.getPerspectiveTransform(src, dst)
    return cv2.warpPerspective(img, m, (w, h), borderValue=(255, 255, 255))


def random_erase(
    img: np.ndarray, rng: np.random.Generator,
    area: tuple = (0.02, 0.2), aspect: tuple = (0.3, 3.3),
) -> np.ndarray:
    h, w = img.shape[:2]
    out = img.copy()
    for _ in range(10):
        target = rng.uniform(*area) * h * w
        ar = np.exp(rng.uniform(np.log(aspect[0]), np.log(aspect[1])))
        eh = int(round(np.sqrt(target * ar)))
        ew = int(round(np.sqrt(target / ar)))
        if eh < h and ew < w:
            y = int(rng.integers(0, h - eh))
            x = int(rng.integers(0, w - ew))
            out[y : y + eh, x : x + ew] = rng.integers(
                0, 256, (eh, ew) + img.shape[2:], dtype=np.uint8
            )
            return out
    return out


def vertical_line_eraser(
    img: np.ndarray, rng: np.random.Generator,
    num_lines: tuple = (10, 20), value: int = 255,
) -> np.ndarray:
    """Random vertical white lines over the word (reference
    ``dump_images``, ``trainModifyCondition.py:125-156``)."""
    out = np.ascontiguousarray(img.copy())
    n = int(rng.integers(num_lines[0], num_lines[1] + 1))
    xs = rng.integers(0, img.shape[1], n)
    if out.dtype == np.uint8 and out.ndim == 3:
        from .native import vertical_lines

        return vertical_lines(out, xs, value)
    out[:, xs] = value
    return out


DEFAULT_OPS = ("noise", "shear_x", "shear_y", "erode", "dilate", "blur",
               "rotate", "random_perspective", "random_erase")


def random_augment(
    img: np.ndarray, rng: np.random.Generator, ops: tuple = DEFAULT_OPS
) -> np.ndarray:
    """Apply one randomly chosen op with reference-ish parameters."""
    op = ops[int(rng.integers(0, len(ops)))]
    if op == "noise":
        return noise(img, rng)
    if op == "shear_x":
        return shear_x(img, float(rng.uniform(-0.3, 0.3)))
    if op == "shear_y":
        return shear_y(img, float(rng.uniform(-0.05, 0.05)))
    if op == "erode":
        return erode(img, 1)
    if op == "dilate":
        return dilate(img, 1)
    if op == "blur":
        return blur(img, float(rng.uniform(0.5, 1.5)))
    if op == "rotate":
        return rotate(img, rng)
    if op == "random_perspective":
        return random_perspective(img, rng, 0.3)
    if op == "random_erase":
        return random_erase(img, rng)
    return img
