"""On-device train-time image augmentation (random resized crop + h-flip).

The reference trains on bare CLIP preprocessing (``/root/reference/
dataset.py:31`` — deterministic resize/center-crop only); contrastive
PRETRAINING at scale wants torchvision-style ``RandomResizedCrop`` (the
open_clip train transform).  A host-side python/PIL implementation would
serialize on the one decode thread and ship a different batch layout per
step; instead the augmentation runs **inside the jitted train step**:

* All shapes are static — crop geometry varies per sample via *sampling
  coordinates*, not array sizes, so there is never a retrace.
* The resample is a separable bilinear gather (two ``take_along_axis``
  passes + lerps, rows then columns) — pure vector ops, no scalar loops.
* Rejection sampling (torchvision retries a crop box up to 10x) is replaced
  by clamping the sampled box to the image — branch-free, XLA-friendly,
  and distributionally indistinguishable for the mild ``scale`` ranges CLIP
  training uses (open_clip default ``(0.9, 1.0)`` never rejects anyway).

Augmentation COMMUTES with CLIP normalization exactly — bilinear weights
sum to 1, so ``interp(a*x + b) == a*interp(x) + b`` — which is why it can
run after ``device_normalize`` on the uint8-transport path and still equal
the augment-then-normalize order.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Random-resized-crop + horizontal-flip parameters.

    Defaults match open_clip's train transform (``scale=(0.9, 1.0)``, no
    flip); ``scale=(0.08, 1.0), ratio=(3/4, 4/3), hflip=0.5`` reproduces the
    torchvision/SimCLR-style aggressive crop.
    """

    scale: Tuple[float, float] = (0.9, 1.0)   # crop area fraction range
    ratio: Tuple[float, float] = (1.0, 1.0)   # aspect ratio range (log-uniform)
    hflip: float = 0.0                        # horizontal flip probability


def _axis_coords(start, size, n_out):
    """Source sampling coordinates for one axis: ``[B, n_out]`` floats.

    align_corners=False convention (torchvision/PIL): output pixel ``j``
    samples ``start + (j + 0.5) * size / n_out - 0.5``.
    """
    j = jnp.arange(n_out, dtype=jnp.float32)[None, :]
    return start[:, None] + (j + 0.5) * (size[:, None] / n_out) - 0.5


def _gather_lerp(x: jnp.ndarray, coords: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Bilinear resample of ``x`` along ``axis`` at per-sample ``coords``.

    ``x``: [B, H, W, C]; ``coords``: [B, n_out] float source positions.
    """
    n_src = x.shape[axis]
    c = jnp.clip(coords, 0.0, n_src - 1)
    i0 = jnp.floor(c).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, n_src - 1)
    frac = (c - i0.astype(jnp.float32)).astype(x.dtype)
    shape = [coords.shape[0]] + [1, 1, 1]
    shape[axis] = coords.shape[1]
    i0 = i0.reshape(shape)
    i1 = i1.reshape(shape)
    frac = frac.reshape(shape)
    lo = jnp.take_along_axis(x, i0, axis=axis)
    hi = jnp.take_along_axis(x, i1, axis=axis)
    return lo + (hi - lo) * frac


def augment_batch(
    rng: jax.Array, images: jnp.ndarray, cfg: AugmentConfig
) -> jnp.ndarray:
    """Random-resized-crop (+ optional h-flip) a batch, per-sample, on device.

    ``images``: [B, H, W, C] float (any preprocessing state — the transform
    commutes with per-channel affine normalization).  Output has the SAME
    shape: each sample's random crop box is resampled back to (H, W).
    """
    B, H, W, _ = images.shape
    k_area, k_ar, k_x, k_y, k_flip = jax.random.split(rng, 5)

    area = jax.random.uniform(
        k_area, (B,), minval=cfg.scale[0], maxval=cfg.scale[1]
    ) * (H * W)
    log_r0, log_r1 = math.log(cfg.ratio[0]), math.log(cfg.ratio[1])
    ar = jnp.exp(jax.random.uniform(k_ar, (B,), minval=log_r0, maxval=log_r1))
    # Box (clamped to the image instead of torchvision's retry loop).
    w = jnp.clip(jnp.sqrt(area * ar), 1.0, float(W))
    h = jnp.clip(jnp.sqrt(area / ar), 1.0, float(H))
    x0 = jax.random.uniform(k_x, (B,)) * (W - w)
    y0 = jax.random.uniform(k_y, (B,)) * (H - h)

    ys = _axis_coords(y0, h, H)
    xs = _axis_coords(x0, w, W)
    out = _gather_lerp(images, ys, axis=1)
    out = _gather_lerp(out, xs, axis=2)

    if cfg.hflip > 0:
        flip = jax.random.bernoulli(k_flip, cfg.hflip, (B,))
        out = jnp.where(flip[:, None, None, None], out[:, :, ::-1, :], out)
    return out
