"""Image transforms for the input pipeline (PIL + numpy, host-side).

Parity target: reference data/webdataset_reader.py:23-85 (`ImageNetTransform`):
  * train: RandomResizedCrop(resolution, scale=(min_scale, 1.0),
    ratio=(3/4, 4/3) when aspect-ratio aug is on) + RandomHorizontalFlip
  * eval: Resize(resolution) + CenterCrop(resolution)
  * bilinear or bicubic interpolation per config.

Outputs are float32 NHWC in [0, 1] (the TPU-native layout; the reference
emits CHW tensors).
"""

from __future__ import annotations

import math
import random
from typing import Optional, Tuple

import numpy as np
from PIL import Image

_INTERPOLATION = {
    "bilinear": Image.BILINEAR,
    "bicubic": Image.BICUBIC,
    "nearest": Image.NEAREST,
    "lanczos": Image.LANCZOS,
}


def random_resized_crop_params(
    height: int,
    width: int,
    scale: Tuple[float, float],
    ratio: Tuple[float, float],
    rng: random.Random,
) -> Tuple[int, int, int, int]:
    """(top, left, h, w) following torchvision RandomResizedCrop.get_params."""
    area = height * width
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect_ratio = math.exp(rng.uniform(log_ratio[0], log_ratio[1]))
        w = int(round(math.sqrt(target_area * aspect_ratio)))
        h = int(round(math.sqrt(target_area / aspect_ratio)))
        if 0 < w <= width and 0 < h <= height:
            top = rng.randint(0, height - h)
            left = rng.randint(0, width - w)
            return top, left, h, w
    # fallback: center crop
    in_ratio = width / height
    if in_ratio < ratio[0]:
        w = width
        h = int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        h = height
        w = int(round(h * ratio[1]))
    else:
        w, h = width, height
    top = (height - h) // 2
    left = (width - w) // 2
    return top, left, h, w


class TrainTransform:
    """RandomResizedCrop + HFlip -> float32 HWC in [0, 1]."""

    def __init__(
        self,
        resolution: int = 256,
        min_scale: float = 0.8,
        use_aspect_ratio_aug: bool = True,
        use_random_crop: bool = True,
        interpolation: str = "bilinear",
        seed: Optional[int] = None,
    ):
        self.resolution = resolution
        self.min_scale = min_scale
        self.ratio = (3.0 / 4.0, 4.0 / 3.0) if use_aspect_ratio_aug else (1.0, 1.0)
        self.use_random_crop = use_random_crop
        self.interpolation = interpolation  # name kept for the native backend
        self.interp = _INTERPOLATION[interpolation]
        self.rng = random.Random(seed)

    def __call__(self, img: Image.Image, rng: Optional[random.Random] = None) -> np.ndarray:
        # `rng` overrides the shared instance rng: the data pipeline passes a
        # per-sample rng derived from (seed, process, sample index) so the
        # augmentation stream is a pure function of sample position —
        # identical across serial/thread/process decode backends and across
        # runs (the shared self.rng is kept for direct/legacy callers).
        rng = self.rng if rng is None else rng
        img = img.convert("RGB")
        if self.use_random_crop:
            top, left, h, w = random_resized_crop_params(
                img.height, img.width, (self.min_scale, 1.0), self.ratio, rng
            )
            img = img.resize(
                (self.resolution, self.resolution), self.interp,
                box=(left, top, left + w, top + h),
            )
        else:
            img = resize_shorter_side(img, self.resolution, self.interp)
            img = center_crop(img, self.resolution)
        if rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        return np.asarray(img, np.float32) / 255.0


class EvalTransform:
    """Resize(shorter side) + CenterCrop -> float32 HWC in [0, 1]."""

    def __init__(self, resolution: int = 256, interpolation: str = "bilinear"):
        self.resolution = resolution
        self.interpolation = interpolation  # name kept for the native backend
        self.interp = _INTERPOLATION[interpolation]

    def __call__(self, img: Image.Image) -> np.ndarray:
        img = img.convert("RGB")
        img = resize_shorter_side(img, self.resolution, self.interp)
        img = center_crop(img, self.resolution)
        return np.asarray(img, np.float32) / 255.0


def resize_shorter_side(img: Image.Image, size: int, interp) -> Image.Image:
    w, h = img.size
    if w <= h:
        new_w, new_h = size, max(size, int(round(size * h / w)))
    else:
        new_w, new_h = max(size, int(round(size * w / h))), size
    return img.resize((new_w, new_h), interp)


def center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    left = (w - size) // 2
    top = (h - size) // 2
    return img.crop((left, top, left + size, top + size))
