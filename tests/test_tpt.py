"""TPT test-time prompt tuning (tapclip_tpu/tpt.py).

Pins: the steps=0 / single-view program reproduces the plain forward; the
tuning step actually lowers the selected-marginal entropy; confidence
selection picks the lowest-entropy views; padded classes stay masked; the
CoCoOp/MaPLe guards fire; and the CLI sweep runs end-to-end on a synthetic
color-separable folder.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapclip_tpu.models.model_wrapper import NEG_INF, FullModel, full_model_forward
from tapclip_tpu.tpt import TPTConfig, _selected_marginal_entropy, make_tpt_predict_fn

CLASSES = ["Backpack", "Pen", "Monitor"]


@pytest.fixture()
def model(tiny_cfg, tiny_params, tiny_prompt_cfg):
    return FullModel(CLASSES, tiny_params, tiny_cfg, prompt_cfg=tiny_prompt_cfg)


@pytest.fixture()
def imgs(tiny_cfg, rng):
    return jnp.asarray(
        rng.standard_normal((4, tiny_cfg.image_size, tiny_cfg.image_size, 3)),
        jnp.float32,
    )


def test_n_selected():
    assert TPTConfig(n_views=16, select_frac=0.25).n_selected == 4
    assert TPTConfig(n_views=3, select_frac=0.01).n_selected == 1
    assert TPTConfig(n_views=4, select_frac=1.0).n_selected == 4


def test_steps0_single_view_matches_forward(model, imgs):
    """No tuning + no augmentation must be the plain model forward."""
    fn = make_tpt_predict_fn(
        model.clip_cfg, model.prompt_cfg, TPTConfig(n_views=1, steps=0)
    )
    logits, aux = fn(
        model.clip_params, model.trainable, model.prompt_learner.bank,
        imgs, jax.random.PRNGKey(0),
    )
    ref = full_model_forward(
        model.clip_params, model.trainable, model.prompt_learner.bank,
        imgs, None, clip_cfg=model.clip_cfg, prompt_cfg=model.prompt_cfg,
    )["logits"]
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
    assert float(aux["entropy_before"]) == pytest.approx(
        float(aux["entropy_after"])
    )


def test_tuning_reduces_entropy(model, imgs):
    fn = make_tpt_predict_fn(
        model.clip_cfg, model.prompt_cfg,
        TPTConfig(n_views=4, select_frac=0.5, steps=2, lr=5e-3),
    )
    logits, aux = fn(
        model.clip_params, model.trainable, model.prompt_learner.bank,
        imgs, jax.random.PRNGKey(1),
    )
    assert logits.shape == (4, model.prompt_learner.bank.class_mask.shape[0])
    assert float(aux["entropy_after"]) < float(aux["entropy_before"])


def test_padded_classes_stay_masked(model, imgs):
    fn = make_tpt_predict_fn(
        model.clip_cfg, model.prompt_cfg, TPTConfig(n_views=2, steps=1)
    )
    logits, _ = fn(
        model.clip_params, model.trainable, model.prompt_learner.bank,
        imgs, jax.random.PRNGKey(2),
    )
    pad = ~np.asarray(model.prompt_learner.bank.class_mask)
    assert pad.any()
    assert np.all(np.asarray(logits)[:, pad] <= NEG_INF / 2)


def test_padding_rows_do_not_change_real_rows(model, imgs):
    """Per-sample tuning is independent: telemetry mask aside, a padded
    garbage row must not perturb the real rows' logits."""
    fn = make_tpt_predict_fn(
        model.clip_cfg, model.prompt_cfg, TPTConfig(n_views=2, steps=1)
    )
    bank = model.prompt_learner.bank
    full_mask = jnp.ones((4,), bool)
    pad_mask = full_mask.at[3].set(False)
    la, _ = fn(model.clip_params, model.trainable, bank, imgs,
               jax.random.PRNGKey(3), full_mask)
    lb, _ = fn(model.clip_params, model.trainable, bank, imgs,
               jax.random.PRNGKey(3), pad_mask)
    np.testing.assert_allclose(np.asarray(la[:3]), np.asarray(lb[:3]))


def test_selection_prefers_confident_views():
    # View 1 is near-deterministic (low entropy); view 0 uniform.  With k=1
    # the marginal entropy must equal view 1's own entropy.
    logp = jnp.log(jnp.asarray(
        [[[0.5, 0.5], [0.99, 0.01]]], jnp.float32
    ))
    ent = _selected_marginal_entropy(logp, 1)
    expected = -(0.99 * np.log(0.99) + 0.01 * np.log(0.01))
    assert float(ent[0]) == pytest.approx(expected, rel=1e-5)


def test_guards(model):
    cond = dataclasses.replace(model.prompt_cfg, image_conditioned=True)
    with pytest.raises(NotImplementedError, match="image_conditioned"):
        make_tpt_predict_fn(model.clip_cfg, cond, TPTConfig())
    maple = dataclasses.replace(model.prompt_cfg, maple_depth=2)
    with pytest.raises(NotImplementedError, match="maple_depth"):
        make_tpt_predict_fn(model.clip_cfg, maple, TPTConfig())


def test_cli_end_to_end(tmp_path):
    from PIL import Image

    from tapclip_tpu.config import TINY_TEST
    from tapclip_tpu.tpt import main

    rng = np.random.default_rng(0)
    colors = {"Blue": (30, 30, 200), "Red": (200, 30, 30)}
    for name, c in colors.items():
        d = tmp_path / "val" / name
        d.mkdir(parents=True)
        for i in range(4):
            arr = np.clip(
                np.array(c)[None, None]
                + rng.normal(0, 15, (TINY_TEST.image_size,) * 2 + (3,)),
                0, 255,
            ).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg")

    out = main([
        "--val-root", str(tmp_path / "val"), "--preset", "tiny",
        "--views", "3", "--select-frac", "0.34", "--steps", "1",
        "--batch-size", "8",
    ])
    for k in ("accuracy", "baseline_accuracy", "entropy_before",
              "entropy_after"):
        assert np.isfinite(out[k])
    assert 0.0 <= out["accuracy"] <= 100.0
