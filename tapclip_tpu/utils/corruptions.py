"""On-device image corruptions (the ImageNet-C robustness protocol).

Hendrycks & Dietterich (2019) benchmark classifier robustness by evaluating
on corrupted copies of the val set at 5 severities.  The canonical suite
generates corrupted JPEGs on the host; on this stack that would pay the
tunnel's host->device tax per (corruption, severity) pass, so the
corruptions here are implemented as pure jax functions applied INSIDE the
jitted eval step: uint8 batch -> [0,1] floats -> corrupt -> CLIP
normalization -> tower, one fused program per corruption type (severity is
a traced argument — one executable covers all 5 levels; only ``pixelate``
specializes on its static resize shape).

Included: the noise family (gaussian/shot/impulse), blur (gaussian), and
the digital family (contrast/brightness/saturate/pixelate).  The
file-codec corruptions (jpeg) and the weather compositions (fog/frost/
snow — which need external frost textures) are host-bound by nature and
intentionally out of scope.

Severity constants follow the reference implementation
(github.com/hendrycks/robustness) where the operation translates directly.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict

SEVERITIES = (1, 2, 3, 4, 5)


def _sev(table, severity):
    """Severity (traced int32 1..5) -> constant via a gather."""
    import jax.numpy as jnp

    t = jnp.asarray(table, jnp.float32)
    return t[jnp.clip(severity, 1, len(table)) - 1]


def gaussian_noise(x, severity, rng):
    import jax
    import jax.numpy as jnp

    sigma = _sev((0.08, 0.12, 0.18, 0.26, 0.38), severity)
    return jnp.clip(x + sigma * jax.random.normal(rng, x.shape), 0.0, 1.0)


def shot_noise(x, severity, rng):
    import jax
    import jax.numpy as jnp

    lam = _sev((60.0, 25.0, 12.0, 5.0, 3.0), severity)
    # Poisson photon count at rate x*lam, rescaled.  lam is traced, so use
    # the gaussian approximation N(x*lam, x*lam) (exact poisson sampling
    # needs a static rate; the approximation is standard for lam*x >~ 1).
    mean = x * lam
    noisy = mean + jnp.sqrt(jnp.maximum(mean, 1e-6)) * jax.random.normal(
        rng, x.shape
    )
    return jnp.clip(noisy / lam, 0.0, 1.0)


def impulse_noise(x, severity, rng):
    import jax
    import jax.numpy as jnp

    p = _sev((0.03, 0.06, 0.09, 0.17, 0.27), severity)
    k1, k2 = jax.random.split(rng)
    u = jax.random.uniform(k1, x.shape)
    salt = (jax.random.uniform(k2, x.shape) < 0.5).astype(x.dtype)
    return jnp.where(u < p, salt, x)


def gaussian_blur(x, severity, rng=None):
    """Separable gaussian blur; the 21-tap kernel is built from the traced
    sigma (taps beyond ~3 sigma carry ~0 weight, so one static width covers
    every severity)."""
    import jax.numpy as jnp

    sigma = _sev((1.0, 2.0, 3.0, 4.0, 6.0), severity)
    R = 10
    t = jnp.arange(-R, R + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (t / sigma) ** 2)
    k = k / k.sum()

    def blur_axis(img, axis):
        # [B,H,W,C]: depthwise 1-D convolution via padding + dot with the
        # stacked shifted views (windowed gather keeps it XLA-fusable).
        moved = jnp.moveaxis(img, axis, -1)  # [..., L]
        L = moved.shape[-1]
        padded = jnp.pad(moved, [(0, 0)] * (moved.ndim - 1) + [(R, R)],
                         mode="edge")
        idx = jnp.arange(L)[:, None] + jnp.arange(2 * R + 1)[None, :]
        windows = padded[..., idx]  # [..., L, 2R+1]
        out = jnp.einsum("...lk,k->...l", windows, k)
        return jnp.moveaxis(out, -1, axis)

    y = blur_axis(blur_axis(x, 1), 2)
    return jnp.clip(y, 0.0, 1.0)


def contrast(x, severity, rng=None):
    import jax.numpy as jnp

    c = _sev((0.4, 0.3, 0.2, 0.1, 0.05), severity)
    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    return jnp.clip((x - mean) * c + mean, 0.0, 1.0)


def brightness(x, severity, rng=None):
    import jax.numpy as jnp

    b = _sev((0.1, 0.2, 0.3, 0.4, 0.5), severity)
    return jnp.clip(x + b, 0.0, 1.0)


def saturate(x, severity, rng=None):
    import jax.numpy as jnp

    s = _sev((0.3, 0.1, 2.0, 5.0, 10.0), severity)
    gray = x.mean(axis=-1, keepdims=True)
    return jnp.clip(gray + (x - gray) * s, 0.0, 1.0)


def pixelate(x, severity, rng=None):
    """Resize down then back up.  The factor sets a STATIC intermediate
    shape, so this corruption re-specializes per severity (5 executables);
    severity must be a python int here and the wrapper enforces it."""
    import jax
    import jax.numpy as jnp

    if not isinstance(severity, int):
        raise TypeError(
            "pixelate needs a static (python int) severity: the resize "
            "shape is part of the program"
        )
    factor = (0.6, 0.5, 0.4, 0.3, 0.25)[min(max(severity, 1), 5) - 1]
    B, H, W, C = x.shape
    h, w = max(1, int(H * factor)), max(1, int(W * factor))
    down = jax.image.resize(x, (B, h, w, C), "linear")
    return jnp.clip(jax.image.resize(down, (B, H, W, C), "nearest"), 0.0, 1.0)


CORRUPTIONS: Dict[str, Callable] = {
    "gaussian_noise": gaussian_noise,
    "shot_noise": shot_noise,
    "impulse_noise": impulse_noise,
    "gaussian_blur": gaussian_blur,
    "contrast": contrast,
    "brightness": brightness,
    "saturate": saturate,
    "pixelate": pixelate,
}

# Corruptions whose severity is baked into the program shape (static).
STATIC_SEVERITY = frozenset({"pixelate"})

# Corruptions that consume randomness (rng is otherwise ignored).
STOCHASTIC = frozenset({"gaussian_noise", "shot_noise", "impulse_noise"})


def corrupt(images01, name: str, severity, rng=None):
    """Apply corruption ``name`` to a [0,1] float batch -> [0,1] batch.

    ``severity`` may be a traced scalar except for ``STATIC_SEVERITY``
    corruptions.  Stochastic corruptions require ``rng``.
    """
    if name not in CORRUPTIONS:
        raise KeyError(f"unknown corruption {name!r}; have {sorted(CORRUPTIONS)}")
    if name in STOCHASTIC and rng is None:
        raise ValueError(f"corruption {name!r} requires an rng key")
    return CORRUPTIONS[name](images01, severity, rng)


def corrupt_uint8_normalized(images_u8, name: str, severity, rng=None):
    """uint8 batch -> corrupt in [0,1] -> CLIP-normalized f32.

    The one-call form eval steps fuse into their programs (mirrors
    ``data.preprocess.device_normalize`` for the clean path).
    """
    import jax.numpy as jnp

    from tapclip_tpu.data.preprocess import _MEAN, _STD

    x = images_u8.astype(jnp.float32) / 255.0
    x = corrupt(x, name, severity, rng)
    return (x - jnp.asarray(_MEAN)) / jnp.asarray(_STD)
