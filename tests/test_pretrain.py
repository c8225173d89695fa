"""Contrastive pretraining tests: local loss, global-batch collectives on the
virtual 8-device mesh, and a train step that actually learns."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tapclip_tpu.models import clip as C
from tapclip_tpu.parallel.mesh import make_mesh
from tapclip_tpu.parallel.sharding import replicate, shard_batch, shard_params
from tapclip_tpu.pretrain import (
    contrastive_loss_global,
    contrastive_loss_local,
    make_pretrain_step,
)


def test_local_loss_perfect_alignment_is_low(rng):
    feats = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    scale = jnp.asarray(np.log(100.0), jnp.float32)
    aligned = contrastive_loss_local(feats, feats, scale)
    shuffled = contrastive_loss_local(feats, feats[::-1], scale)
    assert float(aligned) < float(shuffled)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_global_loss_matches_local(rng):
    """All-gathered global-batch loss == single-device loss on the same data."""
    img = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)
    scale = jnp.asarray(2.0, jnp.float32)
    local = contrastive_loss_local(img, txt, scale)

    mesh = make_mesh(dp=8, tp=1)
    with mesh:
        img_s, txt_s = shard_batch((img, txt), mesh)
        global_loss = jax.jit(
            lambda a, b, s: contrastive_loss_global(a, b, s, mesh)
        )(img_s, txt_s, scale)
    np.testing.assert_allclose(float(global_loss), float(local), rtol=1e-5)


def test_pretrain_step_learns(tiny_cfg, rng):
    """A few steps on a fixed tiny batch should reduce the contrastive loss."""
    cfg = tiny_cfg
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-3)
    step = make_pretrain_step(cfg, opt)
    opt_state = opt.init(params)

    images = jnp.asarray(
        rng.standard_normal((4, cfg.image_size, cfg.image_size, 3)), jnp.float32
    )
    ids = jnp.asarray(
        rng.integers(1, cfg.vocab_size - 2, (4, cfg.context_length)), jnp.int32
    )
    ids = ids.at[:, 0].set(cfg.vocab_size - 2).at[:, -1].set(cfg.vocab_size - 1)

    losses = []
    for _ in range(10):
        params, opt_state, m = step(params, opt_state, images, ids)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert float(params["logit_scale"]) <= float(np.log(100.0)) + 1e-6


@pytest.mark.parametrize("policy", ["dots", "full"])
def test_remat_grads_match_none(tiny_cfg, rng, policy):
    """CLIPConfig.remat is a FLOPs/memory trade only: gradients through the
    rematted towers must equal the non-rematted ones."""
    params = C.init_clip_params(jax.random.PRNGKey(0), tiny_cfg)
    images = jnp.asarray(
        rng.standard_normal((4, tiny_cfg.image_size, tiny_cfg.image_size, 3)),
        jnp.float32,
    )
    ids = jnp.asarray(
        rng.integers(1, tiny_cfg.vocab_size - 2, (4, tiny_cfg.context_length)),
        jnp.int32,
    )

    def loss(p, cfg):
        from tapclip_tpu.pretrain import contrastive_loss_local

        img = C.encode_image(p, cfg, images)
        txt = C.encode_text(p, cfg, ids)
        return contrastive_loss_local(img, txt, p["logit_scale"])

    g0 = jax.grad(loss)(params, tiny_cfg)
    g1 = jax.grad(loss)(params, tiny_cfg.replace(remat=policy))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        g0,
        g1,
    )


def test_ema_update_tracks_params(tiny_cfg):
    from tapclip_tpu.pretrain import make_ema_update

    params = C.init_clip_params(jax.random.PRNGKey(0), tiny_cfg)
    target = jax.tree.map(lambda a: a + 1.0, params)
    ema = jax.tree.map(jnp.copy, params)
    upd = make_ema_update(0.5)
    for _ in range(20):
        ema = upd(ema, target)
    # geometric convergence toward the (fixed) params
    err = max(
        float(jnp.max(jnp.abs(e - t)))
        for e, t in zip(jax.tree.leaves(ema), jax.tree.leaves(target))
    )
    assert err < 1e-4


def test_scan_unroll_grads_match_rolled(tiny_cfg, rng):
    """CLIPConfig.scan_unroll is a pure loop transform: values and gradients
    must equal the rolled scan."""
    params = C.init_clip_params(jax.random.PRNGKey(0), tiny_cfg)
    images = jnp.asarray(
        rng.standard_normal((4, tiny_cfg.image_size, tiny_cfg.image_size, 3)),
        jnp.float32,
    )
    ids = jnp.asarray(
        rng.integers(1, tiny_cfg.vocab_size - 2, (4, tiny_cfg.context_length)),
        jnp.int32,
    )

    def loss(p, cfg):
        from tapclip_tpu.pretrain import contrastive_loss_local

        img = C.encode_image(p, cfg, images)
        txt = C.encode_text(p, cfg, ids)
        return contrastive_loss_local(img, txt, p["logit_scale"])

    g0 = jax.grad(loss)(params, tiny_cfg)
    g1 = jax.grad(loss)(params, tiny_cfg.replace(scan_unroll=8))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        g0,
        g1,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_pretrain_step_sharded(tiny_cfg, rng):
    cfg = tiny_cfg
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-3)
    mesh = make_mesh(dp=8, tp=1)
    step = make_pretrain_step(cfg, opt, mesh=mesh)

    images = jnp.asarray(
        rng.standard_normal((16, cfg.image_size, cfg.image_size, 3)), jnp.float32
    )
    ids = jnp.asarray(
        rng.integers(1, cfg.vocab_size - 2, (16, cfg.context_length)), jnp.int32
    )
    with mesh:
        params_d = shard_params(params, mesh)
        opt_state = replicate(opt.init(params), mesh)
        images_d, ids_d = shard_batch((images, ids), mesh)
        params_d, opt_state, m = step(params_d, opt_state, images_d, ids_d)
        params_d, opt_state, m2 = step(params_d, opt_state, images_d, ids_d)
    assert np.isfinite(float(m2["loss"]))


def test_validation_fn(tiny_cfg, rng):
    from tapclip_tpu.pretrain import make_validation_fn

    params = C.init_clip_params(jax.random.PRNGKey(0), tiny_cfg)
    validate = make_validation_fn(tiny_cfg)

    def batches():
        for i in range(3):
            r = np.random.default_rng(i)
            yield (
                r.standard_normal(
                    (8, tiny_cfg.image_size, tiny_cfg.image_size, 3)
                ).astype(np.float32),
                r.integers(
                    1, tiny_cfg.vocab_size - 2, (8, tiny_cfg.context_length)
                ).astype(np.int32),
            )

    loss, metrics = validate(params, batches(), max_samples=16)
    assert np.isfinite(loss)
    assert set(metrics) == {
        "i2t_r@1", "i2t_r@5", "i2t_r@10", "t2i_r@1", "t2i_r@5", "t2i_r@10",
    }
    for v in metrics.values():
        assert 0.0 <= v <= 1.0


# ---------------------------------------------------------------------------
# GradCache full-negatives accumulation (make_accum_pretrain_step)
# ---------------------------------------------------------------------------

def _macro(cfg, rng, n):
    images = jnp.asarray(
        rng.standard_normal((n, cfg.image_size, cfg.image_size, 3)),
        jnp.float32,
    )
    ids = jnp.asarray(
        rng.integers(1, cfg.vocab_size - 2, (n, cfg.context_length)), jnp.int32
    )
    return images, ids


def _copy(tree):
    # Both steps donate (params, opt_state); never reuse a donated tree.
    return jax.tree.map(jnp.array, tree)


def test_accum_step_matches_one_shot(tiny_cfg, rng):
    """K-micro GradCache step == one plain step on the same KxB macro batch:
    same loss, same updated params (the exact-objective claim)."""
    from tapclip_tpu.pretrain import make_accum_pretrain_step

    cfg = tiny_cfg
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    # SGD so the param delta IS the gradient (Adam's normalizer amplifies
    # fp-noise sign flips on ~zero-gradient elements into full +-lr).
    opt = optax.sgd(1e-2)
    images, ids = _macro(cfg, rng, 8)

    one = make_pretrain_step(cfg, opt)
    p1, s1, m1 = one(_copy(params), opt.init(_copy(params)), images, ids)

    acc = make_accum_pretrain_step(cfg, opt, k=4)
    p2, s2, m2 = acc(_copy(params), opt.init(_copy(params)), images, ids)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6
        ),
        p1,
        p2,
    )


def test_accum_step_matches_one_shot_siglip(tiny_cfg, rng):
    from tapclip_tpu.pretrain import add_siglip_params, make_accum_pretrain_step

    cfg = tiny_cfg
    params = add_siglip_params(C.init_clip_params(jax.random.PRNGKey(0), cfg))
    opt = optax.sgd(1e-2)
    images, ids = _macro(cfg, rng, 8)

    one = make_pretrain_step(cfg, opt, loss="siglip")
    p1, _, m1 = one(_copy(params), opt.init(_copy(params)), images, ids)
    acc = make_accum_pretrain_step(cfg, opt, k=2, loss="siglip")
    p2, _, m2 = acc(_copy(params), opt.init(_copy(params)), images, ids)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(p1["logit_bias"]), np.asarray(p2["logit_bias"]),
        rtol=1e-4, atol=1e-7,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6
        ),
        p1,
        p2,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_accum_step_sharded_matches_unsharded(tiny_cfg, rng):
    """Mesh form: negatives span K x B_global; equals the single-device step."""
    from tapclip_tpu.pretrain import make_accum_pretrain_step

    cfg = tiny_cfg
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    opt = optax.sgd(1e-2)
    images, ids = _macro(cfg, rng, 16)

    ref = make_accum_pretrain_step(cfg, opt, k=2)
    p_ref, _, m_ref = ref(_copy(params), opt.init(_copy(params)), images, ids)

    mesh = make_mesh(dp=8, tp=1)
    acc = make_accum_pretrain_step(cfg, opt, k=2, mesh=mesh)
    with mesh:
        params_d = shard_params(_copy(params), mesh)
        opt_state = replicate(opt.init(_copy(params)), mesh)
        images_d, ids_d = shard_batch((images, ids), mesh)
        p_d, _, m_d = acc(params_d, opt_state, images_d, ids_d)
    np.testing.assert_allclose(
        float(m_ref["loss"]), float(m_d["loss"]), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6
        ),
        p_ref,
        jax.device_get(p_d),
    )


def test_accum_step_stochastic_knobs(tiny_cfg, rng):
    """augment + patch_dropout run inside the accum step; rng is enforced."""
    from tapclip_tpu.data.augment import AugmentConfig
    from tapclip_tpu.pretrain import make_accum_pretrain_step

    cfg = tiny_cfg.replace(patch_dropout=0.5)
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-3)
    images, ids = _macro(cfg, rng, 4)
    acc = make_accum_pretrain_step(
        cfg, opt, k=2, augment=AugmentConfig(scale=(0.8, 1.0), hflip=0.5)
    )
    with pytest.raises(ValueError, match="rng"):
        acc(_copy(params), opt.init(_copy(params)), images, ids)
    p, s, m = acc(
        _copy(params), opt.init(_copy(params)), images, ids,
        jax.random.PRNGKey(3),
    )
    assert np.isfinite(float(m["loss"]))


def test_accum_step_validates_shapes(tiny_cfg, rng):
    from tapclip_tpu.pretrain import make_accum_pretrain_step

    with pytest.raises(ValueError, match="k >= 2"):
        make_accum_pretrain_step(tiny_cfg, optax.adam(1e-3), k=1)
    acc = make_accum_pretrain_step(tiny_cfg, optax.adam(1e-3), k=3)
    params = C.init_clip_params(jax.random.PRNGKey(0), tiny_cfg)
    images, ids = _macro(tiny_cfg, rng, 4)  # 4 % 3 != 0
    opt = optax.adam(1e-3)
    with pytest.raises(ValueError, match="divisible"):
        acc(params, opt.init(params), images, ids)


def test_accum_step_moe_aux_loss(tiny_cfg, rng):
    """MoE towers under GradCache: the load-balance aux joins the objective
    (per-micro mean) and router params receive gradients."""
    from tapclip_tpu.pretrain import make_accum_pretrain_step

    cfg = tiny_cfg.replace(moe_experts=2)
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    opt = optax.sgd(1e-2)
    images, ids = _macro(cfg, rng, 8)

    p0 = _copy(params)
    acc = make_accum_pretrain_step(cfg, opt, k=4)
    p2, _, m = acc(_copy(params), opt.init(_copy(params)), images, ids)
    assert np.isfinite(float(m["loss"]))

    # routers moved => their gradient was nonzero (the lb term reaches them)
    def leaf_delta(path_leaf_pairs, key):
        return [
            float(np.abs(np.asarray(b) - np.asarray(a)).max())
            for (pa, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(p0)[0][0:],
                jax.tree_util.tree_flatten_with_path(p2)[0][0:],
            )
            if key in str(pa)
        ]

    deltas = leaf_delta(None, "router")
    assert deltas and max(deltas) > 0.0

    # aux weight moves the objective: zero-weight run reports a lower loss
    cfg0 = cfg.replace(moe_aux_weight=0.0)
    acc0 = make_accum_pretrain_step(cfg0, opt, k=4)
    _, _, m0 = acc0(_copy(params), opt.init(_copy(params)), images, ids)
    assert float(m["loss"]) > float(m0["loss"])


def test_cli_accum_rejects_lora_and_distill(tmp_path):
    from tapclip_tpu.pretrain_cli import main

    with pytest.raises(ValueError, match="accum-full-negatives"):
        main(["--preset", "tiny", "--synthetic-data", "--epochs", "1",
              "--batch-size", "4", "--output-root", str(tmp_path),
              "--accum-full-negatives", "2", "--lora-rank", "2"])


class TestLockedTowers:
    def test_locked_image_tower_frozen_bitwise(self, tiny_cfg, tiny_params):
        import optax

        from tapclip_tpu.pretrain import lock_tower_optimizer, make_pretrain_step

        opt = lock_tower_optimizer(
            optax.adamw(1e-2, weight_decay=0.1), lock_image=True
        )
        step = make_pretrain_step(tiny_cfg, opt)
        params = jax.tree.map(jnp.copy, tiny_params)
        state = opt.init(params)
        rng = np.random.default_rng(0)
        images = jnp.asarray(
            rng.standard_normal((8, tiny_cfg.image_size, tiny_cfg.image_size, 3)),
            jnp.float32,
        )
        ids = jnp.asarray(
            rng.integers(0, tiny_cfg.vocab_size, (8, tiny_cfg.context_length)),
            jnp.int32,
        )
        losses = []
        for _ in range(5):
            params, state, m = step(params, state, images, ids)
            losses.append(float(m["loss"]))
        # image tower BIT-identical; text tower + logit_scale moved
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(a, b),
            params["visual"], tiny_params["visual"],
        )
        assert not np.allclose(
            np.asarray(params["text"]["text_projection"]),
            np.asarray(tiny_params["text"]["text_projection"]),
        )
        assert float(params["logit_scale"]) != float(tiny_params["logit_scale"])
        assert losses[-1] < losses[0]  # still learns through the text side

    def test_locked_text_tower(self, tiny_cfg, tiny_params):
        import optax

        from tapclip_tpu.pretrain import lock_tower_optimizer, make_pretrain_step

        opt = lock_tower_optimizer(
            optax.adamw(1e-2, weight_decay=0.1), lock_text=True
        )
        step = make_pretrain_step(tiny_cfg, opt)
        params = jax.tree.map(jnp.copy, tiny_params)
        state = opt.init(params)
        rng = np.random.default_rng(1)
        images = jnp.asarray(
            rng.standard_normal((8, tiny_cfg.image_size, tiny_cfg.image_size, 3)),
            jnp.float32,
        )
        ids = jnp.asarray(
            rng.integers(0, tiny_cfg.vocab_size, (8, tiny_cfg.context_length)),
            jnp.int32,
        )
        params, state, _ = step(params, state, images, ids)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(a, b),
            params["text"], tiny_params["text"],
        )
        assert not np.allclose(
            np.asarray(params["visual"]["proj"]),
            np.asarray(tiny_params["visual"]["proj"]),
        )

    def test_lock_both_rejected(self):
        import optax

        from tapclip_tpu.pretrain import lock_tower_optimizer

        with pytest.raises(ValueError, match="BOTH"):
            lock_tower_optimizer(
                optax.adamw(1e-2), lock_image=True, lock_text=True
            )

    def test_unlocked_groups_partial(self, tiny_cfg, tiny_params):
        """unlocked_groups=2 on a locked image tower: head + final block
        train; earlier blocks and the stem stay bit-identical."""
        import optax

        from tapclip_tpu.pretrain import lock_tower_optimizer, make_pretrain_step

        opt = lock_tower_optimizer(
            optax.adamw(1e-2, weight_decay=0.1), lock_image=True,
            unlocked_groups=2,
        )
        step = make_pretrain_step(tiny_cfg, opt)
        params = jax.tree.map(jnp.copy, tiny_params)
        state = opt.init(params)
        rng = np.random.default_rng(2)
        images = jnp.asarray(
            rng.standard_normal((8, tiny_cfg.image_size, tiny_cfg.image_size, 3)),
            jnp.float32,
        )
        ids = jnp.asarray(
            rng.integers(0, tiny_cfg.vocab_size, (8, tiny_cfg.context_length)),
            jnp.int32,
        )
        for _ in range(3):
            params, state, _ = step(params, state, images, ids)
        L = jax.tree.leaves(tiny_params["visual"]["blocks"])[0].shape[0]
        assert L >= 2
        for leaf_new, leaf_old in zip(
            jax.tree.leaves(params["visual"]["blocks"]),
            jax.tree.leaves(tiny_params["visual"]["blocks"]),
        ):
            # layers 0..L-2 frozen bit-exact, layer L-1 moved
            np.testing.assert_array_equal(
                np.asarray(leaf_new)[: L - 1], np.asarray(leaf_old)[: L - 1]
            )
        assert not np.allclose(
            np.asarray(params["visual"]["proj"]),
            np.asarray(tiny_params["visual"]["proj"]),
        )  # head trains
        # at least one final-block leaf moved
        moved = any(
            not np.allclose(np.asarray(a)[L - 1], np.asarray(b)[L - 1])
            for a, b in zip(
                jax.tree.leaves(params["visual"]["blocks"]),
                jax.tree.leaves(tiny_params["visual"]["blocks"]),
            )
        )
        assert moved
        # stem frozen
        np.testing.assert_array_equal(
            np.asarray(params["visual"]["positional_embedding"]),
            np.asarray(tiny_params["visual"]["positional_embedding"]),
        )

    def test_unlocked_groups_rejects_resnet(self, tiny_cfg):
        import optax

        from tapclip_tpu.models import clip as C
        from tapclip_tpu.pretrain import lock_tower_optimizer, make_pretrain_step

        rn_cfg = tiny_cfg.replace(
            vision_tower="resnet", resnet_layers=(1, 1, 1, 1),
            vision_width=16, image_size=32,
        )
        params = C.init_clip_params(jax.random.PRNGKey(0), rn_cfg)
        opt = lock_tower_optimizer(
            optax.adamw(1e-2), lock_image=True, unlocked_groups=1
        )
        step = make_pretrain_step(rn_cfg, opt)
        state = opt.init(params)
        rng = np.random.default_rng(3)
        images = jnp.asarray(
            rng.standard_normal((4, rn_cfg.image_size, rn_cfg.image_size, 3)),
            jnp.float32,
        )
        ids = jnp.asarray(
            rng.integers(0, rn_cfg.vocab_size, (4, rn_cfg.context_length)),
            jnp.int32,
        )
        with pytest.raises(ValueError, match="stacked-blocks"):
            step(params, state, images, ids)


def test_resnet_tower_pretrains(tiny_cfg, rng=None):
    """RN towers must be differentiable under the jitted pretrain step
    (regression: the generic reduce_window(add) avg-pool failed
    linearization under jit on jax 0.9)."""
    import optax

    from tapclip_tpu.models import clip as C
    from tapclip_tpu.pretrain import make_pretrain_step

    cfg = tiny_cfg.replace(
        vision_tower="resnet", resnet_layers=(1, 1, 1, 1),
        vision_width=16, image_size=32,
    )
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    opt = optax.adamw(1e-2)
    step = make_pretrain_step(cfg, opt)
    state = opt.init(params)
    nprng = np.random.default_rng(0)
    images = jnp.asarray(
        nprng.standard_normal((4, 32, 32, 3)), jnp.float32
    )
    ids = jnp.asarray(
        nprng.integers(0, cfg.vocab_size, (4, cfg.context_length)), jnp.int32
    )
    losses = []
    for _ in range(5):
        params, state, m = step(params, state, images, ids)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_step_level_stop_gradient_matches(tiny_cfg, tiny_params):
    """make_pretrain_step(lock_image=True) (backward pruned via
    stop_gradient) must train identically to the optimizer-only lock —
    and keeps the frozen tower's grads out of a global-norm clip."""
    import optax

    from tapclip_tpu.pretrain import lock_tower_optimizer, make_pretrain_step

    base = optax.chain(
        optax.clip_by_global_norm(1.0),
        lock_tower_optimizer(optax.adamw(1e-2), lock_image=True),
    )
    rng = np.random.default_rng(4)
    images = jnp.asarray(
        rng.standard_normal((8, tiny_cfg.image_size, tiny_cfg.image_size, 3)),
        jnp.float32,
    )
    ids = jnp.asarray(
        rng.integers(0, tiny_cfg.vocab_size, (8, tiny_cfg.context_length)),
        jnp.int32,
    )
    step = make_pretrain_step(tiny_cfg, base, lock_image=True)
    params = jax.tree.map(jnp.copy, tiny_params)
    state = base.init(params)
    for _ in range(3):
        params, state, m = step(params, state, images, ids)
    assert np.isfinite(float(m["loss"]))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        params["visual"], tiny_params["visual"],
    )
    # clip norm sees ONLY trainable grads (stop_gradient zeroes the
    # tower's): compare against a reference step where the clip is
    # computed over explicitly-zeroed locked grads
    assert not np.allclose(
        np.asarray(params["text"]["text_projection"]),
        np.asarray(tiny_params["text"]["text_projection"]),
    )
