"""Corruption + robustness-eval tests (utils/corruptions.py, robustness.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapclip_tpu.utils.corruptions import (
    CORRUPTIONS,
    STOCHASTIC,
    corrupt,
    corrupt_uint8_normalized,
)


@pytest.fixture(scope="module")
def batch01():
    return jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))


class TestCorruptions:
    @pytest.mark.parametrize("name", sorted(CORRUPTIONS))
    def test_range_shape_determinism(self, batch01, name):
        rng = jax.random.PRNGKey(1)
        sev = 3 if name == "pixelate" else jnp.int32(3)
        a = np.asarray(corrupt(batch01, name, sev, rng))
        b = np.asarray(corrupt(batch01, name, sev, rng))
        assert a.shape == batch01.shape
        assert a.min() >= 0.0 and a.max() <= 1.0
        np.testing.assert_array_equal(a, b)
        assert not np.allclose(a, np.asarray(batch01))

    def test_contrast_oracle(self, batch01):
        out = np.asarray(corrupt(batch01, "contrast", jnp.int32(1)))
        x = np.asarray(batch01)
        mean = x.mean(axis=(1, 2, 3), keepdims=True)
        np.testing.assert_allclose(out, np.clip((x - mean) * 0.4 + mean, 0, 1),
                                   rtol=1e-5, atol=1e-6)

    def test_brightness_oracle(self, batch01):
        out = np.asarray(corrupt(batch01, "brightness", jnp.int32(2)))
        np.testing.assert_allclose(out, np.clip(np.asarray(batch01) + 0.2, 0, 1),
                                   rtol=1e-5, atol=1e-6)

    def test_impulse_fraction(self):
        x = jnp.full((1, 64, 64, 3), 0.5)
        out = np.asarray(corrupt(x, "impulse_noise", jnp.int32(5),
                                 jax.random.PRNGKey(2)))
        frac = (out != 0.5).mean()
        assert 0.2 <= frac <= 0.35  # p=0.27 at severity 5

    def test_blur_smooths(self, batch01):
        out = np.asarray(corrupt(batch01, "gaussian_blur", jnp.int32(5)))
        assert out.std() < np.asarray(batch01).std() * 0.6

    def test_severity_scales_noise(self, batch01):
        rng = jax.random.PRNGKey(3)
        d1 = np.abs(np.asarray(corrupt(batch01, "gaussian_noise", jnp.int32(1), rng))
                    - np.asarray(batch01)).mean()
        d5 = np.abs(np.asarray(corrupt(batch01, "gaussian_noise", jnp.int32(5), rng))
                    - np.asarray(batch01)).mean()
        assert d5 > d1 * 2

    def test_pixelate_needs_static_severity(self, batch01):
        with pytest.raises(TypeError, match="static"):
            corrupt(batch01, "pixelate", jnp.int32(3))

    def test_unknown_name_and_missing_rng(self, batch01):
        with pytest.raises(KeyError, match="unknown corruption"):
            corrupt(batch01, "frobnicate", 1)
        with pytest.raises(ValueError, match="requires an rng"):
            corrupt(batch01, "gaussian_noise", jnp.int32(1))

    def test_uint8_normalized_matches_manual(self):
        from tapclip_tpu.data.preprocess import _MEAN, _STD

        u8 = jnp.asarray(
            np.random.default_rng(0).integers(0, 256, (2, 8, 8, 3)), jnp.uint8
        )
        out = np.asarray(
            corrupt_uint8_normalized(u8, "brightness", jnp.int32(1))
        )
        x = np.clip(np.asarray(u8, np.float32) / 255.0 + 0.1, 0, 1)
        np.testing.assert_allclose(out, (x - _MEAN) / _STD, rtol=1e-5, atol=1e-5)


def test_robustness_cli_end_to_end(tmp_path):
    """Full sweep on a color-separable folder with the tiny tower: schema,
    clean row first, retention bookkeeping, artifacts."""
    from PIL import Image

    from tapclip_tpu.config import TINY_TEST
    from tapclip_tpu.robustness import main, mean_corruption_accuracy

    rng = np.random.default_rng(0)
    colors = {"Blue": (30, 30, 200), "Red": (200, 30, 30)}
    for name, c in colors.items():
        d = tmp_path / "val" / name
        d.mkdir(parents=True)
        for i in range(6):
            arr = np.clip(
                np.array(c)[None, None]
                + rng.normal(0, 15, (TINY_TEST.image_size,) * 2 + (3,)),
                0, 255,
            ).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg")

    rows = main([
        "--val-root", str(tmp_path / "val"), "--preset", "tiny",
        "--corruptions", "brightness", "gaussian_noise", "pixelate",
        "--severities", "1", "5", "--batch-size", "8",
        "--out", str(tmp_path / "rob"),
    ])
    assert rows[0]["Corruption"] == "clean" and rows[0]["Severity"] == 0
    assert len(rows) == 1 + 3 * 2
    for r in rows:
        assert 0.0 <= r["Accuracy"] <= 100.0
        assert r["Retention"] >= 0.0
    assert np.isfinite(mean_corruption_accuracy(rows))
    assert (tmp_path / "rob" / "robustness.csv").exists()
    assert (tmp_path / "rob" / "robustness_bar.png").exists()
    header = (tmp_path / "rob" / "robustness.csv").read_text().splitlines()[0]
    assert header == "Corruption,Severity,Accuracy,Retention"


def test_unknown_corruption_rejected(tmp_path):
    from tapclip_tpu.robustness import evaluate_robustness

    with pytest.raises(KeyError, match="unknown corruptions"):
        evaluate_robustness(None, [], corruptions=("nope",))


def test_maple_rejected(tiny_cfg, tiny_params, tiny_prompt_cfg):
    """MaPLe's trainable vision prompts would be silently dropped by the
    frozen-tower classify program — must refuse."""
    import dataclasses

    from tapclip_tpu.models.model_wrapper import FullModel
    from tapclip_tpu.robustness import evaluate_robustness

    pcfg = dataclasses.replace(tiny_prompt_cfg, maple_depth=2)
    model = FullModel(["A", "B"], tiny_params, tiny_cfg, prompt_cfg=pcfg)
    with pytest.raises(NotImplementedError, match="maple"):
        evaluate_robustness(model, [])
