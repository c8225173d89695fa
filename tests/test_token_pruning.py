"""Attention-aware token pruning (eval acceleration) tests."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tapclip_tpu.models import clip as C


@pytest.fixture()
def imgs(tiny_cfg, rng):
    return jnp.asarray(
        rng.standard_normal((3, tiny_cfg.image_size, tiny_cfg.image_size, 3)),
        jnp.float32,
    )


def test_ratio_one_is_exact(tiny_cfg, tiny_params, imgs):
    exact = C.encode_image(tiny_params, tiny_cfg, imgs)
    cfg1 = tiny_cfg.replace(token_keep_ratio=1.0)
    np.testing.assert_array_equal(
        np.asarray(C.encode_image(tiny_params, cfg1, imgs)), np.asarray(exact)
    )


def test_pruned_forward_runs_and_approximates(tiny_cfg, tiny_params, imgs):
    # tiny cfg: 2 layers; prune after layer 1.
    cfg = tiny_cfg.replace(token_keep_ratio=0.9, token_prune_layer=1)
    pruned = C.encode_image(tiny_params, cfg, imgs)
    exact = C.encode_image(tiny_params, tiny_cfg, imgs)
    assert pruned.shape == exact.shape
    # cosine similarity should remain high (tiny model, mild pruning)
    a = np.asarray(C.l2_normalize(pruned), np.float32)
    b = np.asarray(C.l2_normalize(exact), np.float32)
    cos = (a * b).sum(-1)
    assert (cos > 0.5).all(), cos


def test_prune_layer_out_of_range_is_exact(tiny_cfg, tiny_params, imgs):
    cfg = tiny_cfg.replace(token_keep_ratio=0.5, token_prune_layer=99)
    np.testing.assert_array_equal(
        np.asarray(C.encode_image(tiny_params, cfg, imgs)),
        np.asarray(C.encode_image(tiny_params, tiny_cfg, imgs)),
    )


def test_full_model_with_pruning(tiny_cfg, tiny_params, tiny_prompt_cfg, imgs):
    from tapclip_tpu.models.model_wrapper import FullModel

    cfg = tiny_cfg.replace(token_keep_ratio=0.9, token_prune_layer=1)
    m = FullModel(["A", "B"], tiny_params, cfg, prompt_cfg=tiny_prompt_cfg)
    out = m(np.asarray(imgs), np.asarray([0, 1, 0]))
    assert out["logits"].shape == (3, 2)
    assert np.isfinite(float(out["loss"]))


def test_token_pruning_rejected_for_resnet():
    """token_keep_ratio on a convolutional tower must fail loudly (no token
    sequence to prune), not be a silent no-op."""
    import jax
    import jax.numpy as jnp
    import pytest

    from tapclip_tpu.config import MODEL_PRESETS
    from tapclip_tpu.models import clip as C
    from tapclip_tpu.models.resnet import init_resnet_params

    cfg = MODEL_PRESETS["RN50"].replace(image_size=64, token_keep_ratio=0.5)
    params = {"visual": init_resnet_params(jax.random.PRNGKey(0), cfg)}
    with pytest.raises(NotImplementedError, match="ViT towers only"):
        C.encode_image(params, cfg, jnp.zeros((1, 64, 64, 3), jnp.float32))
