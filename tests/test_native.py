"""Native C++ image pipeline tests: bit-exact parity with the PIL path.

The native library is built on demand (g++ + libjpeg/libpng); tests skip if
the toolchain is unavailable rather than fail.
"""

import os

import numpy as np
import pytest
from PIL import Image

from tapclip_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native pipeline unavailable: {native.build_error()}"
)


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("native"))
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(224, 224), (457, 300), (100, 640), (64, 64), (301, 299)]):
        arr = rng.integers(0, 255, (h, w, 3), np.uint8)
        p = os.path.join(root, f"p{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
        j = os.path.join(root, f"j{i}.jpg")
        Image.fromarray(arr).save(j, quality=90)
        paths.append(j)
    return paths


def test_bit_exact_vs_pil(images):
    from tapclip_tpu.data.preprocess import preprocess_path

    for p in images:
        a = native.decode_one(p, 224)
        b = preprocess_path(p, 224)
        np.testing.assert_array_equal(a, b, err_msg=p)


def test_batch_decode(images):
    out, ok = native.decode_batch(images, 112, num_threads=2)
    assert out.shape == (len(images), 112, 112, 3)
    assert ok.all()


def test_unnormalized_range(images):
    out = native.decode_one(images[0], 64, do_normalize=False)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_corrupt_file(tmp_path):
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"not an image at all")
    _, ok = native.decode_batch([bad], 32)
    assert not ok[0]
    with pytest.raises(IOError):
        native.decode_one(bad, 32)


def test_loader_uses_native(tmp_path):
    from tapclip_tpu.data.imagefolder import Loader
    from tapclip_tpu.data.synthetic import build_imagefolder

    root = str(tmp_path / "tree")
    build_imagefolder(root, ["A"], per_class=5, image_size=40)
    samples = [(os.path.join(root, "A", f), 0) for f in sorted(os.listdir(root + "/A"))]
    loader = Loader(samples, batch_size=3, image_size=32)
    assert loader.use_native
    batches = list(loader)
    assert batches[0][0].shape == (3, 32, 32, 3)
    # parity against the pure-python loader path
    loader_py = Loader(samples, batch_size=3, image_size=32, use_native=False)
    for (a, la, ma), (b, lb, mb) in zip(batches, loader_py):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(la, lb)


def test_decode_bytes_batch_matches_paths(tmp_path):
    """The from-bytes entry point is bit-identical to the path entry point
    and flags undecodable blobs instead of failing the batch."""
    from tapclip_tpu.data import native

    if not native.available():
        pytest.skip(f"native pipeline unavailable: {native.build_error()}")
    from PIL import Image

    rng = np.random.default_rng(3)
    paths, blobs = [], []
    for i in range(3):
        arr = rng.integers(0, 255, (40 + i, 50 - i, 3), dtype=np.uint8)
        p = tmp_path / f"{i}.jpg"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
        blobs.append(p.read_bytes())
    by_path, ok1 = native.decode_batch(paths, 32)
    by_bytes, ok2 = native.decode_bytes_batch(blobs + [b"junk"], 32)
    assert ok1.all() and ok2.tolist() == [True, True, True, False]
    np.testing.assert_array_equal(by_path, by_bytes[:3])


# ---------------------------------------------------------------------------
# fast_decode (DCT-scaled JPEG, opt-in)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def big_jpegs(tmp_path_factory):
    """Smooth large JPEGs (short side >= 2x target) where the DCT-scaled
    path actually engages, plus a small one where it must stay exact."""
    root = str(tmp_path_factory.mktemp("fastdec"))
    rng = np.random.default_rng(1)
    paths = []
    for i, (w, h) in enumerate([(1024, 768), (768, 1024), (512, 512), (300, 200)]):
        base = rng.integers(0, 255, (h // 16, w // 16, 3), np.uint8)
        arr = np.array(Image.fromarray(base).resize((w, h), Image.BILINEAR))
        p = os.path.join(root, f"big{i}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    return paths


def test_fast_decode_close_to_exact(big_jpegs):
    exact, ok1 = native.decode_batch(big_jpegs, 224, do_normalize=False)
    fast, ok2 = native.decode_batch(big_jpegs, 224, do_normalize=False,
                                    fast_decode=True)
    assert ok1.all() and ok2.all()
    # scaled-IDCT pixels differ slightly where the scale engages...
    d = np.abs(exact - fast)
    assert d.max() < 0.15 and d.mean() < 0.02
    # ...and must be IDENTICAL where it cannot (short side < 2x target).
    np.testing.assert_array_equal(exact[3], fast[3])


def test_fast_decode_bytes_matches_paths(big_jpegs):
    blobs = [open(p, "rb").read() for p in big_jpegs]
    a, ok1 = native.decode_batch(big_jpegs, 224, fast_decode=True)
    b, ok2 = native.decode_bytes_batch(blobs, 224, fast_decode=True)
    assert ok1.all() and ok2.all()
    np.testing.assert_array_equal(a, b)


def test_fast_decode_png_unaffected(images):
    pngs = [p for p in images if p.endswith(".png")]
    a, _ = native.decode_batch(pngs, 112)
    b, _ = native.decode_batch(pngs, 112, fast_decode=True)
    np.testing.assert_array_equal(a, b)


def test_loader_fast_decode_knob(big_jpegs):
    from tapclip_tpu.data.imagefolder import Loader

    samples = [(p, 0) for p in big_jpegs]
    exact = next(iter(Loader(samples, len(samples))))[0]
    fast_loader = Loader(samples, len(samples), fast_decode=True)
    assert fast_loader.fast_decode
    fast = next(iter(fast_loader))[0]
    assert np.abs(exact - fast).max() < 0.6  # normalized units (/std)
    assert not np.array_equal(exact[0], fast[0])  # scale engaged on big jpeg


def test_decode_batch_u8_matches_quantized_float(images, big_jpegs):
    for fast in (False, True):
        f32, ok1 = native.decode_batch(images + big_jpegs, 112,
                                       do_normalize=False, fast_decode=fast)
        u8, ok2 = native.decode_batch_u8(images + big_jpegs, 112,
                                         fast_decode=fast)
        assert ok1.all() and ok2.all() and u8.dtype == np.uint8
        np.testing.assert_array_equal(
            u8, np.rint(np.clip(f32, 0.0, 1.0) * 255.0).astype(np.uint8)
        )


def test_decode_bytes_batch_u8_matches_paths(big_jpegs):
    blobs = [open(p, "rb").read() for p in big_jpegs]
    a, ok1 = native.decode_batch_u8(big_jpegs, 224)
    b, ok2 = native.decode_bytes_batch_u8(blobs, 224)
    assert ok1.all() and ok2.all()
    np.testing.assert_array_equal(a, b)


def test_loader_uint8_direct_path(big_jpegs):
    """Loader uint8 transport == PIL uint8 preprocess (same contract the
    float path pins), now through the direct-u8 native route."""
    from tapclip_tpu.data.imagefolder import Loader
    from tapclip_tpu.data.preprocess import preprocess_pil_uint8

    samples = [(p, 0) for p in big_jpegs]
    images, _, mask = next(iter(Loader(samples, len(samples),
                                       output_dtype="uint8")))
    assert images.dtype == np.uint8 and mask.all()
    for row, (p, _) in zip(images, samples):
        ref = preprocess_pil_uint8(Image.open(p).convert("RGB"), 224)
        np.testing.assert_array_equal(row, ref)
