"""Image-conditioned prompts (CoCoOp-style meta-net).

The reference's attribution is defined per-sample but its prompts are
image-independent, so every row coincides (SURVEY.md §3.2 identity; pinned in
test_model_wrapper.py).  With ``PromptConfig.image_conditioned=True`` each
sample shifts the context by a projection of its image feature — attribution
becomes genuinely per-(sample, class) and the text pass runs per pair.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapclip_tpu.models import clip as C
from tapclip_tpu.models.model_wrapper import FullModel, full_model_forward


CLASSES = ["Backpack", "Pen", "Monitor"]


@pytest.fixture()
def cond_prompt_cfg(tiny_prompt_cfg):
    return dataclasses.replace(tiny_prompt_cfg, image_conditioned=True)


@pytest.fixture()
def imgs(tiny_cfg, rng):
    return jnp.asarray(
        rng.standard_normal((4, tiny_cfg.image_size, tiny_cfg.image_size, 3)),
        jnp.float32,
    )


def test_zero_init_matches_unconditioned(tiny_cfg, tiny_params, tiny_prompt_cfg,
                                         cond_prompt_cfg, imgs):
    """meta_net's output layer is zero-init: the conditioned model must start
    exactly equal to the unconditioned one."""
    base = FullModel(CLASSES, tiny_params, tiny_cfg, prompt_cfg=tiny_prompt_cfg)
    cond = FullModel(CLASSES, tiny_params, tiny_cfg, prompt_cfg=cond_prompt_cfg)
    # share the trained leaves the two configs have in common
    cond.trainable = dict(cond.trainable, ctx=base.trainable["ctx"],
                          adjustor=base.trainable["adjustor"])
    ob, oc = base(imgs), cond(imgs)
    np.testing.assert_allclose(
        np.asarray(ob["logits"]), np.asarray(oc["logits"]), rtol=1e-5, atol=1e-5
    )
    assert oc["attribution"].shape == (4, len(CLASSES), tiny_prompt_cfg.prompt_len)
    # all per-sample rows identical while the shift is zero
    a = np.asarray(oc["attribution"])
    np.testing.assert_allclose(a, np.broadcast_to(a[:1], a.shape), atol=1e-6)
    np.testing.assert_allclose(a[0], np.asarray(ob["attribution"]), atol=1e-5)


def test_nonzero_meta_net_gives_per_sample_attribution(tiny_cfg, tiny_params,
                                                       cond_prompt_cfg, imgs, rng):
    model = FullModel(CLASSES, tiny_params, tiny_cfg, prompt_cfg=cond_prompt_cfg)
    mn = model.trainable["meta_net"]
    mn = dict(mn, w2=jnp.asarray(rng.standard_normal(mn["w2"].shape) * 0.2,
                                 jnp.float32))
    model.trainable = dict(model.trainable, meta_net=mn)
    a = np.asarray(model(imgs)["attribution"])  # [B, C, P]
    spread = np.abs(a - a.mean(axis=0, keepdims=True)).max()
    assert spread > 1e-4, "attribution rows did not differentiate per sample"


def test_meta_net_receives_gradient(tiny_cfg, tiny_params, cond_prompt_cfg, imgs):
    model = FullModel(CLASSES, tiny_params, tiny_cfg, prompt_cfg=cond_prompt_cfg)
    labels = jnp.asarray([0, 1, 2, 0])
    feats = C.encode_image(tiny_params, tiny_cfg, imgs)

    def loss(tr):
        out = full_model_forward(
            model.clip_params, tr, model.prompt_learner.bank, None, labels,
            clip_cfg=tiny_cfg, prompt_cfg=cond_prompt_cfg,
            with_loss=True, image_feats=feats,
        )
        return out["loss"]

    g = jax.grad(loss)(model.trainable)
    # w2 is zero-init but sits upstream of the (non-stop-grad) encode pass:
    # its gradient must be nonzero through the relu bottleneck.
    assert float(jnp.abs(g["meta_net"]["w2"]).max()) > 0.0
    assert float(jnp.abs(g["ctx"]).max()) > 0.0


def test_conditioned_add_class_and_predict(tiny_cfg, tiny_params, cond_prompt_cfg, imgs):
    model = FullModel(CLASSES, tiny_params, tiny_cfg, prompt_cfg=cond_prompt_cfg)
    model.add_class_prompt("Clipboards")
    out = model(imgs)
    assert out["logits"].shape == (4, 4)
    assert out["attribution"].shape[1] == 4
    preds, names = model.predict(imgs)
    assert len(names) == 4


def test_conditioned_training_learns(tiny_cfg, tiny_params, cond_prompt_cfg, tmp_path):
    """End-to-end: the conditioned model trains through the standard cached
    trainer (meta_net is an ordinary trainable leaf) and the loss drops."""
    from tapclip_tpu.config import TrainConfig
    from tapclip_tpu.data.imagefolder import get_dataloaders
    from tapclip_tpu.data.preprocess import make_preprocess
    from tapclip_tpu.data.synthetic import build_imagefolder
    from tapclip_tpu.trainer import fit_prompt_model

    root = str(tmp_path / "imgs")
    build_imagefolder(root, CLASSES, per_class=8, image_size=tiny_cfg.image_size)
    train_loader, val_loader = get_dataloaders(
        root, CLASSES, batch_size=8, num_shots=5,
        preprocess=make_preprocess(tiny_cfg.image_size),
        image_size=tiny_cfg.image_size, verbose=False,
    )
    model = FullModel(CLASSES, tiny_params, tiny_cfg, prompt_cfg=cond_prompt_cfg)
    result = fit_prompt_model(
        model, train_loader, val_loader,
        TrainConfig(lr=5e-2, epochs=4, patience=10), verbose=False,
    )
    assert result.loss_history[-1] < result.loss_history[0]
    # the meta-net moved off its zero init
    w2 = np.asarray(result.best_trainable["meta_net"]["w2"])
    assert np.abs(w2).max() > 0.0


def test_conditioned_idiomatic_text_mode(tiny_cfg, tiny_params, tiny_prompt_cfg, imgs):
    """Conditioning composes with the idiomatic (CoOp-style) text mode —
    per-class EOT positions tile correctly across the sample axis."""
    cfg_p = dataclasses.replace(
        tiny_prompt_cfg, image_conditioned=True, text_mode="idiomatic",
        prompt_len=3,
    )
    model = FullModel(CLASSES, tiny_params, tiny_cfg, prompt_cfg=cfg_p)
    out = model(imgs)
    assert out["logits"].shape == (4, len(CLASSES))
    assert out["attribution"].shape == (4, len(CLASSES), 3)
    assert np.isfinite(np.asarray(out["logits"], np.float32)).all()
