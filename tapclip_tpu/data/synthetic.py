"""Synthetic data utilities for tests and benchmarks.

No OfficeHome/DomainNet data or pretrained weights ship with this sandbox, so
tests and benchmarks run on synthetic batches and synthetic on-disk
ImageFolder trees with the exact layout the real datasets use
(``root/ClassName/img.jpg``).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np


def random_batch(
    rng: np.random.Generator,
    batch_size: int,
    image_size: int = 224,
    n_classes: int = 5,
) -> Tuple[np.ndarray, np.ndarray]:
    images = rng.standard_normal((batch_size, image_size, image_size, 3)).astype(
        np.float32
    )
    labels = rng.integers(0, n_classes, size=(batch_size,)).astype(np.int32)
    return images, labels


def build_imagefolder(
    root: str,
    class_names: Sequence[str],
    per_class: int = 8,
    image_size: int = 32,
    seed: int = 0,
) -> str:
    """Write a tiny ImageFolder tree of random JPEGs; returns root."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    for name in class_names:
        cdir = os.path.join(root, name)
        os.makedirs(cdir, exist_ok=True)
        for i in range(per_class):
            arr = rng.integers(0, 255, size=(image_size, image_size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(cdir, f"{name.lower()}_{i:03d}.jpg"))
    return root
