"""Host-side image preprocessing (CLIP eval transform).

The reference uses the open_clip validation transform returned by
``create_model_and_transforms`` for *both* train and val
(``/root/reference/models/clip_wrapper.py:13``, ``train.py:80``):
``Resize(n_px, bicubic)`` (shorter side) -> ``CenterCrop(n_px)`` ->
``ToTensor`` -> ``Normalize(CLIP mean/std)``.

This module reproduces that pipeline with PIL + NumPy, producing **NHWC**
float32 arrays (TPU-native layout; the patchify matmul consumes NHWC
directly).  Normalization can optionally be deferred to the device
(``normalize_on_device``) so uint8 crosses the host->device boundary —
4x less transfer bandwidth, with mean/std subtraction fused into the first
XLA program.
"""

from __future__ import annotations

import numpy as np

from tapclip_tpu.config import IMAGE_MEAN, IMAGE_STD

try:
    from PIL import Image

    _HAS_PIL = True
except ImportError:  # pragma: no cover
    Image = None
    _HAS_PIL = False

_MEAN = np.asarray(IMAGE_MEAN, np.float32)
_STD = np.asarray(IMAGE_STD, np.float32)


def resize_shorter_side(img: "Image.Image", size: int) -> "Image.Image":
    """torchvision.Resize(int) semantics: shorter side -> size, keep aspect.

    torchvision truncates the long side (``int(size * long / short)``,
    _compute_resized_output_size) — matched exactly here and in the native
    C++ pipeline.
    """
    w, h = img.size
    if w <= h:
        new_w, new_h = size, max(1, int(size * h / w))
    else:
        new_w, new_h = max(1, int(size * w / h)), size
    return img.resize((new_w, new_h), Image.BICUBIC)


def center_crop(img: "Image.Image", size: int) -> "Image.Image":
    w, h = img.size
    left = round((w - size) / 2.0)
    top = round((h - size) / 2.0)
    return img.crop((left, top, left + size, top + size))


def normalize(arr01: np.ndarray) -> np.ndarray:
    """[0,1] float array (..., 3) -> CLIP-normalized."""
    return (arr01 - _MEAN) / _STD


def preprocess_pil(
    img: "Image.Image", image_size: int = 224, do_normalize: bool = True
) -> np.ndarray:
    """PIL image -> ``[image_size, image_size, 3]`` float32 NHWC slice."""
    img = img.convert("RGB")
    img = resize_shorter_side(img, image_size)
    img = center_crop(img, image_size)
    arr = np.asarray(img, np.float32) / 255.0
    if do_normalize:
        arr = normalize(arr)
    return arr.astype(np.float32)


def preprocess_path(path: str, image_size: int = 224, do_normalize: bool = True) -> np.ndarray:
    if not _HAS_PIL:
        raise RuntimeError("PIL is required for image loading")
    with Image.open(path) as img:
        return preprocess_pil(img, image_size, do_normalize)


def make_preprocess(image_size: int = 224, do_normalize: bool = True):
    """Factory mirroring ``clip_model.get_preprocess()`` (clip_wrapper.py:64)."""

    def _fn(img):
        if isinstance(img, str):
            return preprocess_path(img, image_size, do_normalize)
        return preprocess_pil(img, image_size, do_normalize)

    return _fn


def preprocess_pil_uint8(img: "Image.Image", image_size: int = 224) -> np.ndarray:
    """PIL image -> ``[S, S, 3]`` uint8 (resize+crop only, no normalize).

    PIL's bicubic resize outputs uint8, so the float pipeline's pre-normalize
    values are exactly ``k/255`` — shipping uint8 across host->device and
    normalizing on device (:func:`device_normalize`) is bit-identical to the
    float path at 1/4 the transfer bandwidth.
    """
    img = img.convert("RGB")
    img = resize_shorter_side(img, image_size)
    img = center_crop(img, image_size)
    return np.asarray(img, np.uint8)


def make_preprocess_uint8(image_size: int = 224):
    def _fn(img):
        if isinstance(img, str):
            if not _HAS_PIL:
                raise RuntimeError("PIL is required for image loading")
            with Image.open(img) as im:
                return preprocess_pil_uint8(im, image_size)
        return preprocess_pil_uint8(img, image_size)

    return _fn


def device_normalize(images: "np.ndarray"):
    """On-device normalization for uint8 NHWC batches (jnp-compatible).

    ``(x/255 - mean)/std`` in f32 — the exact math the host pipeline applies,
    so the uint8-transfer path is bit-identical to host-normalized float32.
    """
    import jax.numpy as jnp

    x = images.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(_MEAN)) / jnp.asarray(_STD)
