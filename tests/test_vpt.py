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
