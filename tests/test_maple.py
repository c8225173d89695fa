"""MaPLe multi-modal prompt learning tests (tapclip_tpu/maple.py + core)."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapclip_tpu.config import TINY_TEST, PromptConfig
from tapclip_tpu.models import layers
from tapclip_tpu.models.clip import init_clip_params
from tapclip_tpu.models.model_wrapper import FullModel, full_model_forward

DEEP_CFG = dataclasses.replace(TINY_TEST, vision_layers=4, text_layers=4)


@pytest.fixture(scope="module")
def tiny_params():
    return init_clip_params(jax.random.PRNGKey(0), TINY_TEST)


@pytest.fixture(scope="module")
def deep_params():
    return init_clip_params(jax.random.PRNGKey(0), DEEP_CFG)


def _tower_inputs(key, B=2, T=9, W=64):
    return jax.random.normal(key, (B, T, W), jnp.float32)


class TestTransformerDeepPrompts:
    def test_all_false_mask_is_baseline(self, deep_params):
        """Inert rows must reproduce the plain scan bit-exactly."""
        blocks = deep_params["visual"]["blocks"]
        x = _tower_inputs(jax.random.PRNGKey(1))
        prompts = jax.random.normal(jax.random.PRNGKey(2), (3, 2, 64))
        base, _ = layers.transformer_forward(
            x, blocks, DEEP_CFG.vision_heads, act=DEEP_CFG.act
        )
        masked, _ = layers.transformer_forward(
            x, blocks, DEEP_CFG.vision_heads, act=DEEP_CFG.act,
            layer_prompts=prompts, prompt_mask=jnp.zeros((3,), bool),
        )
        np.testing.assert_array_equal(np.asarray(base), np.asarray(masked))

    def test_overwrite_matches_manual_composition(self, deep_params):
        """layer_prompts at offset 0 == manual per-block run + slot set."""
        blocks = deep_params["text"]["blocks"]
        x = _tower_inputs(jax.random.PRNGKey(3))
        P = 2
        prompts = jax.random.normal(jax.random.PRNGKey(4), (3, P, 64))
        mask = jnp.asarray([True, True, False])
        got, _ = layers.transformer_forward(
            x, blocks, DEEP_CFG.text_heads, act=DEEP_CFG.act,
            layer_prompts=prompts, prompt_offset=0, prompt_mask=mask,
        )
        body = functools.partial(
            layers.block_forward, n_heads=DEEP_CFG.text_heads, act=DEEP_CFG.act
        )
        y = x
        for i in range(4):
            y, _ = body(y, jax.tree.map(lambda a: a[i], blocks))
            if i < 3 and bool(mask[i]):
                y = y.at[:, 0:P, :].set(prompts[i][None].astype(y.dtype))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(y), rtol=1e-5, atol=1e-5
        )

    def test_deep_prompts_with_attribution_aux(self, deep_params):
        """attn_to_idx aux now composes with layer_prompts (text MaPLe).

        The aux must equal the plain run's aux when every row is inert, and
        the overwrite must change the aux when rows are live."""
        blocks = deep_params["text"]["blocks"]
        x = _tower_inputs(jax.random.PRNGKey(5))
        prompts = jax.random.normal(jax.random.PRNGKey(6), (3, 2, 64))
        _, aux_base = layers.transformer_forward(
            x, blocks, DEEP_CFG.text_heads, act=DEEP_CFG.act, attn_to_idx=8
        )
        _, aux_inert = layers.transformer_forward(
            x, blocks, DEEP_CFG.text_heads, act=DEEP_CFG.act, attn_to_idx=8,
            layer_prompts=prompts, prompt_offset=0,
            prompt_mask=jnp.zeros((3,), bool),
        )
        np.testing.assert_array_equal(np.asarray(aux_base), np.asarray(aux_inert))
        _, aux_live = layers.transformer_forward(
            x, blocks, DEEP_CFG.text_heads, act=DEEP_CFG.act, attn_to_idx=8,
            layer_prompts=prompts, prompt_offset=0,
        )
        assert not np.allclose(np.asarray(aux_base), np.asarray(aux_live))


def _model(params, cfg, depth, classes=("cat", "dog", "bird"), **pk):
    return FullModel(
        list(classes), params, cfg,
        prompt_cfg=PromptConfig(
            maple_depth=depth, prompt_len=2, max_classes=4, **pk
        ),
        rng=jax.random.PRNGKey(7),
    )


def _images(key, cfg, B=2):
    return jax.random.uniform(key, (B, cfg.image_size, cfg.image_size, 3))


class TestMapleModel:
    def test_trainable_shapes(self, deep_params):
        m = _model(deep_params, DEEP_CFG, depth=3)
        mp = m.trainable["maple"]
        assert mp["txt"].shape == (2, 2, DEEP_CFG.text_width)
        assert mp["proj_w"].shape == (3, DEEP_CFG.text_width, DEEP_CFG.vision_width)
        assert mp["proj_b"].shape == (3, DEEP_CFG.vision_width)

    def test_depth_validation(self, deep_params):
        with pytest.raises(ValueError, match="maple_depth=9"):
            _model(deep_params, DEEP_CFG, depth=9)

    def test_image_conditioned_rejected(self, deep_params):
        with pytest.raises(NotImplementedError, match="image_conditioned"):
            _model(deep_params, DEEP_CFG, depth=2, image_conditioned=True)

    def test_forward_and_loss(self, deep_params):
        m = _model(deep_params, DEEP_CFG, depth=3)
        imgs = _images(jax.random.PRNGKey(8), DEEP_CFG)
        out = m(imgs, labels=jnp.asarray([0, 2]))
        assert out["logits"].shape == (2, 3)
        assert out["attribution"].shape == (3, 2)
        assert np.isfinite(float(out["loss"]))

    def test_depth_changes_features(self, deep_params):
        """MaPLe prompts must actually reach both towers: logits differ from
        the depth-0 baseline, and deeper != shallower."""
        imgs = _images(jax.random.PRNGKey(9), DEEP_CFG)
        base = _model(deep_params, DEEP_CFG, depth=0)(imgs)["logits"]
        d1 = _model(deep_params, DEEP_CFG, depth=1)(imgs)["logits"]
        d3 = _model(deep_params, DEEP_CFG, depth=3)(imgs)["logits"]
        assert not np.allclose(np.asarray(base), np.asarray(d1))
        assert not np.allclose(np.asarray(d1), np.asarray(d3))

    def test_cached_features_rejected(self, deep_params):
        m = _model(deep_params, DEEP_CFG, depth=2)
        with pytest.raises(ValueError, match="cached image_feats"):
            full_model_forward(
                m.clip_params, m.trainable, m.prompt_learner.bank,
                None, None,
                clip_cfg=DEEP_CFG, prompt_cfg=m.prompt_cfg,
                image_feats=jnp.zeros((2, DEEP_CFG.embed_dim)),
            )

    def test_fit_prompt_model_rejected(self, deep_params):
        from tapclip_tpu.config import TrainConfig
        from tapclip_tpu.trainer import fit_prompt_model

        m = _model(deep_params, DEEP_CFG, depth=2)
        with pytest.raises(NotImplementedError, match="fit_maple"):
            fit_prompt_model(m, [], None, TrainConfig())

    def test_grads_reach_all_maple_leaves(self, deep_params):
        m = _model(deep_params, DEEP_CFG, depth=3)
        imgs = _images(jax.random.PRNGKey(10), DEEP_CFG)
        labels = jnp.asarray([0, 1])

        def loss_fn(sub):
            tr = {**m.trainable, **sub}
            out = full_model_forward(
                m.clip_params, tr, m.prompt_learner.bank, imgs, labels,
                clip_cfg=DEEP_CFG, prompt_cfg=m.prompt_cfg, with_loss=True,
            )
            return out["loss"]

        sub = {"ctx": m.trainable["ctx"], "maple": m.trainable["maple"]}
        grads = jax.grad(loss_fn)(sub)
        assert float(jnp.abs(grads["ctx"]).max()) > 0
        assert float(jnp.abs(grads["maple"]["txt"]).max()) > 0
        assert float(jnp.abs(grads["maple"]["proj_w"]).max()) > 0
        assert float(jnp.abs(grads["maple"]["proj_b"]).max()) > 0

    def test_depth_one_has_no_deep_rows(self, tiny_params):
        m = _model(tiny_params, TINY_TEST, depth=1)
        assert m.trainable["maple"]["txt"].shape[0] == 0
        out = m(_images(jax.random.PRNGKey(11), TINY_TEST))
        assert out["logits"].shape == (2, 3)


def test_fit_maple_learns(tmp_path):
    """CLI drive on a color-separable synthetic ImageFolder: accuracy must
    reach ~100% from the random-weight chance baseline."""
    from PIL import Image

    from tapclip_tpu.maple import main

    rng = np.random.default_rng(0)
    colors = {"Blue": (30, 30, 200), "Green": (30, 200, 30), "Red": (200, 30, 30)}
    for name, c in colors.items():
        d = tmp_path / "train" / name
        d.mkdir(parents=True)
        for i in range(10):
            arr = np.clip(
                np.array(c)[None, None]
                + rng.normal(0, 20, (TINY_TEST.image_size,) * 2 + (3,)),
                0, 255,
            ).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg")

    res = main(["--train-root", str(tmp_path / "train"), "--shots", "5",
                "--preset", "tiny", "--depth", "2", "--batch-size", "8",
                "--epochs", "20", "--lr", "5e-2",
                "--save", str(tmp_path / "ckpt")])
    assert res["best_acc"] >= 90.0
    assert res["loss_history"][-1] < res["loss_history"][0]
    assert (tmp_path / "ckpt").exists()
