"""Vision patch-saliency tests (tapclip_tpu/utils/saliency.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapclip_tpu.config import TINY_TEST
from tapclip_tpu.models import clip as clip_model
from tapclip_tpu.utils.saliency import (
    attention_rollout,
    patch_saliency,
    vision_attention_forward,
)

GRID = TINY_TEST.image_size // TINY_TEST.patch_size  # 2
T = GRID * GRID + 1


@pytest.fixture(scope="module")
def params():
    return clip_model.init_clip_params(jax.random.PRNGKey(0), TINY_TEST)


@pytest.fixture(scope="module")
def images():
    return jax.random.uniform(
        jax.random.PRNGKey(1),
        (3, TINY_TEST.image_size, TINY_TEST.image_size, 3))


def test_forward_matches_encode_image(params, images):
    """The explain re-run must describe the model that actually serves."""
    feats, probs = vision_attention_forward(params, TINY_TEST, images)
    ref = clip_model.encode_image(params, TINY_TEST, images)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert probs.shape == (
        TINY_TEST.vision_layers, 3, TINY_TEST.vision_heads, T, T)


def test_probs_are_row_stochastic(params, images):
    _, probs = vision_attention_forward(params, TINY_TEST, images)
    np.testing.assert_allclose(
        np.asarray(probs.sum(-1)), 1.0, rtol=1e-5, atol=1e-5)


def test_rollout_row_stochastic_and_identity(params, images):
    _, probs = vision_attention_forward(params, TINY_TEST, images)
    r = attention_rollout(probs)
    np.testing.assert_allclose(np.asarray(r.sum(-1)), 1.0, rtol=1e-5,
                               atol=1e-5)
    # rollout of pure-identity maps is the identity
    eye = jnp.broadcast_to(jnp.eye(T), probs.shape)
    np.testing.assert_allclose(
        np.asarray(attention_rollout(eye)),
        np.broadcast_to(np.eye(T), (3, T, T)), atol=1e-6)


def test_patch_saliency_shapes_and_range(params, images):
    for method in ("rollout", "last"):
        grid = patch_saliency(params, TINY_TEST, images, method=method)
        assert grid.shape == (3, GRID, GRID)
        assert grid.min() >= 0.0 and grid.max() <= 1.0
        np.testing.assert_allclose(grid.reshape(3, -1).max(-1), 1.0)
    with pytest.raises(ValueError, match="unknown saliency method"):
        patch_saliency(params, TINY_TEST, images, method="gradcam")


def test_uint8_matches_float(params, images):
    """The serving payload path (uint8 pixels) gives the same maps."""
    u8 = (np.asarray(images) * 255).round().astype(np.uint8)
    from tapclip_tpu.data.preprocess import device_normalize

    ref = patch_saliency(
        params, TINY_TEST, device_normalize(jnp.asarray(u8)))
    got = patch_saliency(params, TINY_TEST, jnp.asarray(u8))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_resnet_attention_forward_raises(params, images):
    """The ViT explain re-run still rejects RN towers (patch_saliency has
    its own attnpool path)."""
    rcfg = TINY_TEST.replace(vision_tower="resnet", resnet_layers=(1, 1, 1, 1))
    with pytest.raises(NotImplementedError, match="ViT towers only"):
        vision_attention_forward(params, rcfg, images)


def test_resnet_attnpool_saliency(images):
    """RN towers: the attnpool-query map, pooled output pinned exactly
    against resnet_encode_image."""
    from tapclip_tpu.models.resnet import resnet_encode_image
    from tapclip_tpu.utils.saliency import _jitted_resnet_saliency

    rcfg = TINY_TEST.replace(
        vision_tower="resnet", resnet_layers=(1, 1, 1, 1), image_size=64,
    )
    rparams = clip_model.init_clip_params(jax.random.PRNGKey(1), rcfg)
    rimages = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    pooled, probs = _jitted_resnet_saliency(rcfg)(rparams, rimages)
    ref = resnet_encode_image(rparams, rcfg, rimages)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    g = 64 // 32
    grid = patch_saliency(rparams, rcfg, rimages)
    assert grid.shape == (2, g, g)
    assert grid.min() >= 0.0 and grid.max() <= 1.0
    # probs are a softmax over HW+1 keys; the spatial slice sums to < 1
    assert float(np.asarray(probs).sum(-1).max()) < 1.0 + 1e-5


def test_overlay_png(tmp_path, params, images):
    from tapclip_tpu.utils.plotting import save_saliency_overlay

    grid = patch_saliency(params, TINY_TEST, images)[0]
    out = save_saliency_overlay(
        np.asarray(images)[0], grid, str(tmp_path / "sal.png"))
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_serve_explain_saliency(params):
    from tapclip_tpu.models.model_wrapper import FullModel
    from tapclip_tpu.serve import PredictService

    model = FullModel(["Backpack", "Pen"], params, TINY_TEST)
    svc = PredictService(model, batch_size=2, max_latency_ms=5.0)
    try:
        px = np.random.default_rng(0).uniform(
            size=(TINY_TEST.image_size, TINY_TEST.image_size, 3)
        ).astype(np.float32)
        out = svc.explain(px, saliency=True)
        assert len(out["saliency"]) == GRID
        assert len(out["saliency"][0]) == GRID
        flat = np.asarray(out["saliency"], np.float32)
        assert flat.min() >= 0.0 and flat.max() <= 1.0
        base = svc.explain(px)
        assert "saliency" not in base
        last = svc.explain(px, saliency="last")
        assert np.asarray(last["saliency"]).shape == (GRID, GRID)
    finally:
        svc.close()
