"""On-device augmentation (data/augment.py) + FLIP patch dropout
(models/clip.py::_patch_dropout) — both stochastic TRAIN-path knobs.

Beyond-reference subsystems (the reference trains on bare deterministic
preprocessing, /root/reference/dataset.py:31); correctness here means the
documented invariants, not torch parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tapclip_tpu.config import CLIPConfig
from tapclip_tpu.data.augment import AugmentConfig, augment_batch
from tapclip_tpu.models import clip as clip_model
from tapclip_tpu.pretrain import make_pretrain_step

TINY = CLIPConfig(
    name="tiny",
    image_size=32,
    patch_size=8,
    vision_width=64,
    vision_layers=2,
    vision_heads=2,
    vocab_size=512,
    context_length=16,
    text_width=64,
    text_layers=2,
    text_heads=2,
    embed_dim=32,
)


def _images(key, b=4, hw=32):
    return jax.random.uniform(key, (b, hw, hw, 3), jnp.float32)


# ---------------------------------------------------------------------------
# augment_batch
# ---------------------------------------------------------------------------


def test_identity_crop_is_exact():
    # scale=(1,1), ratio=(1,1): the sampling grid lands exactly on the
    # source pixels -> bit-level identity (frac == 0 everywhere).
    imgs = _images(jax.random.PRNGKey(0))
    out = augment_batch(
        jax.random.PRNGKey(1), imgs, AugmentConfig(scale=(1.0, 1.0))
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))


def test_full_flip_is_exact_mirror():
    imgs = _images(jax.random.PRNGKey(0))
    out = augment_batch(
        jax.random.PRNGKey(1), imgs,
        AugmentConfig(scale=(1.0, 1.0), hflip=1.0),
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs)[:, :, ::-1, :])


def test_crops_vary_per_sample_and_per_rng():
    img = _images(jax.random.PRNGKey(0), b=1)
    batch = jnp.tile(img, (4, 1, 1, 1))
    cfg = AugmentConfig(scale=(0.3, 0.6), ratio=(0.75, 4 / 3))
    out = augment_batch(jax.random.PRNGKey(1), batch, cfg)
    # same source image, independent crops per sample
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))
    # deterministic in the key, different across keys
    out2 = augment_batch(jax.random.PRNGKey(1), batch, cfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = augment_batch(jax.random.PRNGKey(2), batch, cfg)
    assert not np.allclose(np.asarray(out), np.asarray(out3))


def test_bilinear_stays_in_range_and_shape():
    imgs = _images(jax.random.PRNGKey(3), b=3)
    out = augment_batch(
        jax.random.PRNGKey(4), imgs,
        AugmentConfig(scale=(0.08, 1.0), ratio=(0.75, 4 / 3), hflip=0.5),
    )
    assert out.shape == imgs.shape
    # bilinear = convex combination of source pixels
    assert float(out.min()) >= float(imgs.min()) - 1e-6
    assert float(out.max()) <= float(imgs.max()) + 1e-6


def test_commutes_with_normalization():
    # interp(a*x + b) == a*interp(x) + b: augmenting a normalized batch
    # equals normalizing the augmented batch (same rng).
    imgs = _images(jax.random.PRNGKey(5))
    cfg = AugmentConfig(scale=(0.5, 0.9))
    a, b = 2.5, -1.25
    lhs = augment_batch(jax.random.PRNGKey(6), a * imgs + b, cfg)
    rhs = a * augment_batch(jax.random.PRNGKey(6), imgs, cfg) + b
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


# ---------------------------------------------------------------------------
# patch dropout
# ---------------------------------------------------------------------------


def _params(cfg=TINY):
    return clip_model.init_clip_params(jax.random.PRNGKey(0), cfg)


def test_patch_dropout_noop_without_rng():
    cfg = TINY.replace(patch_dropout=0.5)
    params = _params(cfg)
    imgs = _images(jax.random.PRNGKey(1))
    base = clip_model.encode_image(_params(TINY), TINY, imgs)
    out = clip_model.encode_image(params, cfg, imgs)  # no rng -> exact
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))


def test_patch_dropout_changes_features_and_is_deterministic():
    cfg = TINY.replace(patch_dropout=0.5)
    params = _params(cfg)
    imgs = _images(jax.random.PRNGKey(1))
    full = clip_model.encode_image(params, cfg, imgs)
    drop = clip_model.encode_image(
        params, cfg, imgs, rng=jax.random.PRNGKey(2)
    )
    assert not np.allclose(np.asarray(full), np.asarray(drop))
    drop2 = clip_model.encode_image(
        params, cfg, imgs, rng=jax.random.PRNGKey(2)
    )
    np.testing.assert_array_equal(np.asarray(drop), np.asarray(drop2))
    drop3 = clip_model.encode_image(
        params, cfg, imgs, rng=jax.random.PRNGKey(3)
    )
    assert not np.allclose(np.asarray(drop), np.asarray(drop3))


def test_patch_dropout_keep_count():
    # prob=0.5 over the 16-patch grid: tower sees 1 + 8 tokens. Check via
    # the gather itself.
    x = jnp.arange(4 * 17 * 8, dtype=jnp.float32).reshape(4, 17, 8)
    out = clip_model._patch_dropout(x, 0.5, jax.random.PRNGKey(0))
    assert out.shape == (4, 9, 8)
    # class token survives at slot 0
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(x[:, 0]))
    # every kept row is one of the original patch rows
    src = np.asarray(x)
    kept = np.asarray(out[:, 1:])
    for b in range(4):
        for row in kept[b]:
            assert (row == src[b]).all(axis=-1).any()


def test_patch_dropout_rounds_and_degenerates_to_noop():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 17, 8))
    out = clip_model._patch_dropout(x, 0.0, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    # extreme prob keeps at least one patch
    out = clip_model._patch_dropout(x, 0.999, jax.random.PRNGKey(1))
    assert out.shape == (2, 2, 8)


def test_patch_dropout_grads_flow():
    cfg = TINY.replace(patch_dropout=0.5)
    params = _params(cfg)
    imgs = _images(jax.random.PRNGKey(1))

    def loss(p):
        f = clip_model.encode_image(p, cfg, imgs, rng=jax.random.PRNGKey(2))
        return jnp.sum(f.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    gn = float(
        optax.global_norm(jax.tree.map(lambda a: a.astype(jnp.float32),
                                       g["visual"]))
    )
    assert np.isfinite(gn) and gn > 0


def test_patch_dropout_rejects_resnet_and_pruning():
    from tapclip_tpu.config import RN50

    rn = RN50.replace(patch_dropout=0.5)
    with pytest.raises(NotImplementedError):
        clip_model.encode_image(
            {}, rn, jnp.zeros((1, 224, 224, 3)), rng=jax.random.PRNGKey(0)
        )
    cfg = TINY.replace(patch_dropout=0.5, token_keep_ratio=0.5,
                       token_prune_layer=1)
    with pytest.raises(NotImplementedError):
        clip_model.encode_image(
            _params(cfg), cfg, _images(jax.random.PRNGKey(1)),
            rng=jax.random.PRNGKey(0),
        )


# ---------------------------------------------------------------------------
# pretrain-step integration
# ---------------------------------------------------------------------------


def _tokens(key, b=4, cfg=TINY):
    body = jax.random.randint(key, (b, cfg.context_length), 1, 400)
    # EOT = largest id, as encode_text's argmax pooling expects
    return body.at[:, -1].set(cfg.vocab_size - 1)


def test_pretrain_step_with_patch_dropout_and_augment():
    cfg = TINY.replace(patch_dropout=0.5)
    params = _params(cfg)
    opt = optax.adamw(1e-4)
    step = make_pretrain_step(
        cfg, opt, augment=AugmentConfig(scale=(0.6, 1.0), hflip=0.5)
    )
    opt_state = opt.init(params)
    imgs = _images(jax.random.PRNGKey(1))
    ids = _tokens(jax.random.PRNGKey(2))
    p1, o1, m = step(params, opt_state, imgs, ids, jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss"]))
    p1, o1, m2 = step(p1, o1, imgs, ids, jax.random.PRNGKey(4))
    assert np.isfinite(float(m2["loss"]))


def test_pretrain_step_requires_rng_when_stochastic():
    cfg = TINY.replace(patch_dropout=0.5)
    params = _params(cfg)
    opt = optax.adamw(1e-4)
    step = make_pretrain_step(cfg, opt)
    opt_state = opt.init(params)
    with pytest.raises(ValueError, match="rng"):
        step(params, opt_state, _images(jax.random.PRNGKey(1)),
             _tokens(jax.random.PRNGKey(2)))


def test_pretrain_step_sharded_with_stochastic_knobs():
    # dp=2 mesh: the stochastic step compiles and runs under GSPMD.
    import jax as _jax
    from tapclip_tpu.parallel.mesh import make_mesh
    from tapclip_tpu.parallel.sharding import shard_batch, shard_params

    if len(_jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    cfg = TINY.replace(patch_dropout=0.25)
    mesh = make_mesh(dp=2, tp=1)
    params = shard_params(_params(cfg), mesh)
    opt = optax.adamw(1e-4)
    step = make_pretrain_step(
        cfg, opt, mesh=mesh, augment=AugmentConfig(scale=(0.8, 1.0))
    )
    opt_state = opt.init(params)
    batch = shard_batch(
        (_images(jax.random.PRNGKey(1), b=8), _tokens(jax.random.PRNGKey(2), b=8)),
        mesh,
    )
    p1, o1, m = step(params, opt_state, *batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss"]))


def test_pretrain_cli_stochastic_flags(tmp_path):
    from tapclip_tpu.pretrain_cli import main

    out = main([
        "--preset", "tiny", "--synthetic-data", "--epochs", "1",
        "--batch-size", "8", "--platform", "cpu",
        "--output-root", str(tmp_path),
        "--patch-dropout", "0.5", "--augment", "--hflip", "0.5",
    ])
    assert np.isfinite(out["loss_history"][0])
