"""Visual Prompt Tuning tests (CLIPConfig.vpt_tokens — VPT-Shallow)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapclip_tpu.models import clip as C


@pytest.fixture(scope="module")
def vpt_cfg(tiny_cfg):
    return dataclasses.replace(tiny_cfg, vpt_tokens=4)


@pytest.fixture(scope="module")
def vpt_params(vpt_cfg):
    return C.init_clip_params(jax.random.PRNGKey(0), vpt_cfg)


def _images(cfg, n=4, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.standard_normal((n, cfg.image_size, cfg.image_size, 3)), jnp.float32
    )


def test_init_adds_vpt_leaf(vpt_cfg, vpt_params):
    assert vpt_params["visual"]["vpt"].shape == (4, vpt_cfg.vision_width)


def test_resnet_tower_rejects_vpt(tiny_cfg):
    cfg = dataclasses.replace(tiny_cfg, vision_tower="resnet", vpt_tokens=2)
    with pytest.raises(NotImplementedError, match="ViT towers only"):
        C.init_clip_params(jax.random.PRNGKey(0), cfg)


def test_prompts_change_features(tiny_cfg, vpt_cfg, tiny_params, vpt_params):
    """Same tower weights: zero-config output is the baseline, prompts move
    it (the prompt tokens attend into every patch from block 0)."""
    imgs = _images(tiny_cfg)
    base = C.encode_image(tiny_params, tiny_cfg, imgs)
    # graft the baseline tree + fresh prompts -> only the prompts differ
    grafted = dict(
        tiny_params,
        visual=dict(tiny_params["visual"], vpt=vpt_params["visual"]["vpt"]),
    )
    out = C.encode_image(grafted, vpt_cfg, imgs)
    assert out.shape == base.shape
    assert not np.allclose(np.asarray(out), np.asarray(base), atol=1e-4)


def test_zero_prompts_is_identity_config(tiny_cfg, tiny_params):
    """vpt_tokens=0 takes the exact baseline path (no insert, no pad drift)."""
    imgs = _images(tiny_cfg)
    cfg0 = dataclasses.replace(tiny_cfg, vpt_tokens=0)
    np.testing.assert_array_equal(
        np.asarray(C.encode_image(tiny_params, tiny_cfg, imgs)),
        np.asarray(C.encode_image(tiny_params, cfg0, imgs)),
    )


def test_grad_flows_to_prompts(vpt_cfg, vpt_params):
    imgs = _images(vpt_cfg)

    def loss(vpt):
        p = dict(vpt_params, visual=dict(vpt_params["visual"], vpt=vpt))
        return jnp.sum(C.encode_image(p, vpt_cfg, imgs) ** 2)

    g = jax.grad(loss)(vpt_params["visual"]["vpt"])
    assert float(jnp.abs(g).max()) > 0


def test_prompts_survive_patch_dropout(vpt_cfg, vpt_params):
    """Prompts are inserted AFTER patch dropout — gradient must reach them
    under heavy masking (they can never be dropped)."""
    cfg = dataclasses.replace(vpt_cfg, patch_dropout=0.75)
    imgs = _images(cfg)

    def loss(vpt):
        p = dict(vpt_params, visual=dict(vpt_params["visual"], vpt=vpt))
        return jnp.sum(
            C.encode_image(p, cfg, imgs, rng=jax.random.PRNGKey(3)) ** 2
        )

    g = jax.grad(loss)(vpt_params["visual"]["vpt"])
    assert float(jnp.abs(g).max()) > 0


def test_vpt_rejects_token_pruning(vpt_cfg, vpt_params):
    cfg = dataclasses.replace(vpt_cfg, token_keep_ratio=0.5, token_prune_layer=1)
    with pytest.raises(NotImplementedError, match="token_keep_ratio"):
        C.encode_image(vpt_params, cfg, _images(cfg))


class TestEnsureVptParams:
    def test_injects_when_missing(self, tiny_cfg, tiny_params, vpt_cfg):
        out = C.ensure_vpt_params(tiny_params, vpt_cfg, seed=7)
        assert out["visual"]["vpt"].shape == (4, vpt_cfg.vision_width)
        assert "vpt" not in tiny_params["visual"]  # input not mutated

    def test_noop_when_present(self, vpt_cfg, vpt_params):
        assert C.ensure_vpt_params(vpt_params, vpt_cfg) is vpt_params

    def test_noop_when_disabled(self, tiny_cfg, tiny_params):
        assert C.ensure_vpt_params(tiny_params, tiny_cfg) is tiny_params

    def test_rejects_length_mismatch(self, vpt_cfg, vpt_params):
        cfg8 = dataclasses.replace(vpt_cfg, vpt_tokens=8)
        with pytest.raises(ValueError, match="VPT tokens"):
            C.ensure_vpt_params(vpt_params, cfg8)


def test_locked_tower_trains_only_prompts(vpt_cfg, vpt_params):
    """--lock-image-tower --vpt-tokens N semantics: every visual leaf except
    the prompts stays BIT-identical; the prompts move."""
    import optax

    from tapclip_tpu.pretrain import lock_tower_optimizer, make_pretrain_step

    opt = lock_tower_optimizer(
        optax.adamw(1e-2, weight_decay=0.1), lock_image=True
    )
    step = make_pretrain_step(vpt_cfg, opt, lock_image=True)
    params = jax.tree.map(jnp.copy, vpt_params)
    state = opt.init(params)
    rng = np.random.default_rng(0)
    images = _images(vpt_cfg, n=8)
    ids = jnp.asarray(
        rng.integers(0, vpt_cfg.vocab_size, (8, vpt_cfg.context_length)),
        jnp.int32,
    )
    losses = []
    for _ in range(5):
        params, state, m = step(params, state, images, ids)
        losses.append(float(m["loss"]))
    for k, v in params["visual"].items():
        if k == "vpt":
            assert not np.allclose(
                np.asarray(v), np.asarray(vpt_params["visual"]["vpt"])
            )
        else:
            jax.tree.map(
                lambda a, b: np.testing.assert_array_equal(a, b),
                v, vpt_params["visual"][k],
            )
    assert losses[-1] < losses[0]


def test_unlocked_groups_keep_prompts_trainable(vpt_cfg, vpt_params):
    """unlocked_groups=1 (head only) must still train the prompts."""
    import optax

    from tapclip_tpu.pretrain import lock_tower_optimizer, make_pretrain_step

    opt = lock_tower_optimizer(
        optax.adamw(1e-2, weight_decay=0.1), lock_image=True,
        unlocked_groups=1,
    )
    step = make_pretrain_step(vpt_cfg, opt)
    params = jax.tree.map(jnp.copy, vpt_params)
    state = opt.init(params)
    rng = np.random.default_rng(1)
    images = _images(vpt_cfg, n=8, seed=1)
    ids = jnp.asarray(
        rng.integers(0, vpt_cfg.vocab_size, (8, vpt_cfg.context_length)),
        jnp.int32,
    )
    params, state, _ = step(params, state, images, ids)
    vis0, vis1 = vpt_params["visual"], params["visual"]
    assert not np.allclose(np.asarray(vis1["vpt"]), np.asarray(vis0["vpt"]))
    assert not np.allclose(np.asarray(vis1["proj"]), np.asarray(vis0["proj"]))
    np.testing.assert_array_equal(
        np.asarray(vis1["patch_embed"]["w"]), np.asarray(vis0["patch_embed"]["w"])
    )


# ---------------------------------------------------------------------------
# VPT-Deep
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def deep_cfg(tiny_cfg):
    return dataclasses.replace(tiny_cfg, vpt_tokens=4, vpt_deep=True)


@pytest.fixture(scope="module")
def deep_params(deep_cfg):
    return C.init_clip_params(jax.random.PRNGKey(0), deep_cfg)


def test_deep_init_shape(deep_cfg, deep_params):
    assert deep_params["visual"]["vpt"].shape == (
        deep_cfg.vision_layers, 4, deep_cfg.vision_width
    )


def test_deep_differs_from_shallow(deep_cfg, deep_params):
    """Running the SAME [L,P,W] prompts deep vs only row 0 shallow must
    diverge (rows 1..L-1 overwrite the evolved prompt slots)."""
    imgs = _images(deep_cfg)
    deep_out = C.encode_image(deep_params, deep_cfg, imgs)
    shallow_cfg = dataclasses.replace(deep_cfg, vpt_deep=False)
    shallow_params = dict(
        deep_params,
        visual=dict(
            deep_params["visual"], vpt=deep_params["visual"]["vpt"][0]
        ),
    )
    shallow_out = C.encode_image(shallow_params, shallow_cfg, imgs)
    assert not np.allclose(
        np.asarray(deep_out), np.asarray(shallow_out), atol=1e-4
    )


def test_deep_grad_reaches_every_layer(deep_cfg, deep_params):
    imgs = _images(deep_cfg)

    def loss(vpt):
        p = dict(deep_params, visual=dict(deep_params["visual"], vpt=vpt))
        return jnp.sum(C.encode_image(p, deep_cfg, imgs) ** 2)

    g = np.asarray(jax.grad(loss)(deep_params["visual"]["vpt"]))
    per_layer = np.abs(g).max(axis=(1, 2))
    assert (per_layer > 0).all(), per_layer


def test_deep_remat_matches_none(deep_cfg, deep_params):
    imgs = _images(deep_cfg)
    cfg_r = dataclasses.replace(deep_cfg, remat="full")

    def loss(cfg):
        def f(vpt):
            p = dict(deep_params, visual=dict(deep_params["visual"], vpt=vpt))
            return jnp.sum(C.encode_image(p, cfg, imgs) ** 2)
        return jax.grad(f)(deep_params["visual"]["vpt"])

    np.testing.assert_allclose(
        np.asarray(loss(deep_cfg)), np.asarray(loss(cfg_r)), rtol=1e-5
    )


def test_deep_rejects_moe(deep_cfg):
    cfg = dataclasses.replace(deep_cfg, moe_experts=2)
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(NotImplementedError, match="sequential block scan"):
        C.encode_image(params, cfg, _images(cfg))


def test_deep_ensure_rejects_shallow_checkpoint(tiny_params, deep_cfg):
    shallow_cfg = dataclasses.replace(deep_cfg, vpt_deep=False)
    shallow = C.ensure_vpt_params(tiny_params, shallow_cfg, seed=1)
    with pytest.raises(ValueError, match="VPT tokens"):
        C.ensure_vpt_params(shallow, deep_cfg)


def test_saliency_feature_parity_with_vpt(vpt_cfg, vpt_params,
                                          deep_cfg, deep_params):
    """saliency.vision_attention_forward must stay feature-exact with
    encode_image under shallow AND deep prompts, and the saliency grid
    keeps the patch geometry (prompt rows sliced off)."""
    from tapclip_tpu.utils.saliency import patch_saliency, vision_attention_forward

    for cfg, params in ((vpt_cfg, vpt_params), (deep_cfg, deep_params)):
        imgs = _images(cfg, n=2)
        feats, probs = vision_attention_forward(params, cfg, imgs)
        ref = C.encode_image(params, cfg, imgs)
        np.testing.assert_allclose(
            np.asarray(feats), np.asarray(ref), rtol=2e-3, atol=2e-3
        )
        T = 1 + cfg.vpt_tokens + cfg.num_patches
        assert probs.shape[-2:] == (T, T)
        g = cfg.image_size // cfg.patch_size
        sal = patch_saliency(params, cfg, imgs, method="last")
        assert sal.shape == (2, g, g)
        assert np.isfinite(sal).all() and sal.min() >= 0 and sal.max() <= 1
