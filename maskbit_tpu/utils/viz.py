"""Visualization helpers for training logs.

Parity target: reference utils/viz_utils.py:12-93 —
  * make_viz_from_samples: original | reconstruction | difference strips
  * make_viz_reconstructed_stage_two: recon-vs-predicted pairs
  * make_viz_generated_stage_two: generated grids
All NHWC float in [0, 1]; returns (PIL images, uint8 grid array) suitable
for tensorboard `add_image` or file dumps.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
from PIL import Image


def _to_uint8(images: np.ndarray) -> np.ndarray:
    return (np.clip(np.asarray(images), 0.0, 1.0) * 255.0).round().astype(np.uint8)


def make_viz_from_samples(
    original: np.ndarray, reconstructed: np.ndarray
) -> Tuple[List[Image.Image], np.ndarray]:
    """Per-sample [original | reconstruction | difference] strips."""
    original = np.asarray(original)
    reconstructed = np.asarray(reconstructed)
    diff = 0.5 + (original - reconstructed) * 0.5
    strips = []
    for i in range(original.shape[0]):
        strip = np.concatenate(
            [_to_uint8(original[i]), _to_uint8(reconstructed[i]), _to_uint8(diff[i])],
            axis=1,
        )
        strips.append(strip)
    grid = np.concatenate(strips, axis=0)
    return [Image.fromarray(s) for s in strips], grid


def make_viz_reconstructed_stage_two(
    reconstructed: np.ndarray, predicted: np.ndarray
) -> Tuple[List[Image.Image], np.ndarray]:
    """Per-sample [tokenizer reconstruction | generator prediction] pairs."""
    strips = []
    for i in range(np.asarray(reconstructed).shape[0]):
        strip = np.concatenate(
            [_to_uint8(reconstructed[i]), _to_uint8(predicted[i])], axis=1
        )
        strips.append(strip)
    grid = np.concatenate(strips, axis=0)
    return [Image.fromarray(s) for s in strips], grid


def make_viz_generated_stage_two(
    generated: np.ndarray, images_per_row: int = 4
) -> Tuple[List[Image.Image], np.ndarray]:
    """Grid of generated samples."""
    generated = _to_uint8(generated)
    b, h, w, c = generated.shape
    rows = []
    for start in range(0, b, images_per_row):
        row_imgs = list(generated[start : start + images_per_row])
        while len(row_imgs) < images_per_row:
            row_imgs.append(np.zeros((h, w, c), np.uint8))
        rows.append(np.concatenate(row_imgs, axis=1))
    grid = np.concatenate(rows, axis=0)
    return [Image.fromarray(r) for r in rows], grid


def save_image_grid(grid: np.ndarray, path: str) -> None:
    Image.fromarray(grid).save(path)
