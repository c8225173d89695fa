"""BitFit bias-only fine-tuning tests (pretrain.bitfit_optimizer)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.tree_util import tree_flatten_with_path

from tapclip_tpu.models import clip as C
from tapclip_tpu.pretrain import (
    BITFIT_SUFFIXES,
    bitfit_optimizer,
    make_pretrain_step,
)


def _leaf_path(path):
    return "/".join(str(getattr(k, "key", k)) for k in path)


def _is_bitfit_trainable(path_str):
    if not path_str.startswith(("visual/", "text/")):
        return True
    if path_str == "visual/vpt":
        return True
    return path_str.endswith(BITFIT_SUFFIXES)


def _batch(cfg, n=8, seed=0):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(
        rng.standard_normal((n, cfg.image_size, cfg.image_size, 3)), jnp.float32
    )
    ids = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (n, cfg.context_length)), jnp.int32
    )
    return images, ids


def test_only_biases_move(tiny_cfg, tiny_params):
    opt = bitfit_optimizer(optax.adamw(1e-2, weight_decay=0.1))
    step = make_pretrain_step(tiny_cfg, opt)
    params = jax.tree.map(jnp.copy, tiny_params)
    state = opt.init(params)
    images, ids = _batch(tiny_cfg)
    losses = []
    for _ in range(5):
        params, state, m = step(params, state, images, ids)
        losses.append(float(m["loss"]))
    before = dict(
        (_leaf_path(p), np.asarray(l))
        for p, l in tree_flatten_with_path(tiny_params)[0]
    )
    moved = frozen = 0
    for path, leaf in tree_flatten_with_path(params)[0]:
        s = _leaf_path(path)
        if _is_bitfit_trainable(s):
            assert not np.allclose(np.asarray(leaf), before[s]), s
            moved += 1
        else:
            np.testing.assert_array_equal(np.asarray(leaf), before[s], err_msg=s)
            frozen += 1
    assert moved > 2 and frozen > moved  # biases are the small minority
    assert losses[-1] < losses[0]  # biases alone still fit the tiny batch


def test_vpt_trains_under_bitfit(tiny_cfg):
    cfg = dataclasses.replace(tiny_cfg, vpt_tokens=3)
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    opt = bitfit_optimizer(optax.adamw(1e-2, weight_decay=0.1))
    step = make_pretrain_step(cfg, opt)
    state = opt.init(params)
    images, ids = _batch(cfg, seed=1)
    vpt0 = np.asarray(params["visual"]["vpt"])
    w0 = np.asarray(params["visual"]["patch_embed"]["w"])
    params, state, _ = step(params, state, images, ids)
    assert not np.allclose(np.asarray(params["visual"]["vpt"]), vpt0)
    np.testing.assert_array_equal(
        np.asarray(params["visual"]["patch_embed"]["w"]), w0
    )


def test_resnet_bias_suffixes_cover_attnpool(tiny_cfg):
    """On the RN tower the label rule must catch BN biases and the attnpool
    '/b' projections but never weights or BN running stats."""
    cfg = dataclasses.replace(tiny_cfg, vision_tower="resnet")
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    full = {
        f"visual/{_leaf_path(p)}": _is_bitfit_trainable(f"visual/{_leaf_path(p)}")
        for p, _ in tree_flatten_with_path(params["visual"])[0]
    }
    assert any(k.endswith("/b") and v for k, v in full.items())
    assert any(k.endswith("/bias") and v for k, v in full.items())
    for k, v in full.items():
        if k.endswith(("/w", "/scale", "/mean", "/var")):
            assert not v, k


def test_cli_rejects_bad_compositions(tmp_path):
    from tapclip_tpu.pretrain_cli import main

    base = ["--preset", "tiny", "--synthetic-data", "--epochs", "1",
            "--batch-size", "4", "--output-root", str(tmp_path), "--bitfit"]
    with pytest.raises(ValueError, match="pick one"):
        main(base + ["--lora-rank", "2"])
    with pytest.raises(ValueError, match="drop --lock"):
        main(base + ["--lock-image-tower"])
