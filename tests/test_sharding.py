"""Sharded execution tests on the virtual 8-device CPU mesh.

The TPU-native analogue of a fake distributed backend (SURVEY.md §4):
verifies DP batch sharding, TP weight sharding, numerical equivalence of
sharded vs single-device steps, and the full multichip dryrun path.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tapclip_tpu.config import TrainConfig
from tapclip_tpu.data.tokenizer import get_tokenizer
from tapclip_tpu.models.model_wrapper import init_trainable
from tapclip_tpu.models.prompt_learner import PromptLearner
from tapclip_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh
from tapclip_tpu.parallel.sharding import (
    clip_param_specs,
    replicate,
    shard_batch,
    shard_params,
)
from tapclip_tpu.parallel.train_step import (
    init_train_state,
    make_optimizer,
    make_train_step,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _setup(tiny_cfg, tiny_params, tiny_prompt_cfg, rng, B=16):
    learner = PromptLearner(
        ["A", "B", "C"],
        tiny_params,
        tiny_cfg,
        tiny_prompt_cfg,
        get_tokenizer(context_length=tiny_cfg.context_length),
    )
    trainable = init_trainable(jax.random.PRNGKey(0), learner, tiny_prompt_cfg)
    images = jnp.asarray(
        rng.standard_normal((B, tiny_cfg.image_size, tiny_cfg.image_size, 3)),
        jnp.float32,
    )
    labels = jnp.asarray(rng.integers(0, 3, B), jnp.int32)
    mask = jnp.ones((B,), bool)
    return learner, trainable, images, labels, mask


def test_mesh_shapes():
    mesh = make_mesh(dp=4, tp=2)
    assert dict(mesh.shape) == {DATA_AXIS: 4, MODEL_AXIS: 2}
    mesh2 = make_mesh(tp=2)
    assert dict(mesh2.shape) == {DATA_AXIS: 4, MODEL_AXIS: 2}
    with pytest.raises(ValueError):
        make_mesh(dp=16, tp=1)


def test_param_specs_tp_layout(tiny_params):
    mesh = make_mesh(dp=4, tp=2)
    specs = clip_param_specs(tiny_params, mesh)
    blocks = specs["text"]["blocks"]
    assert blocks["attn"]["w_qkv"] == P(None, None, MODEL_AXIS)
    assert blocks["attn"]["w_out"] == P(None, MODEL_AXIS, None)
    assert blocks["mlp"]["w_fc"] == P(None, None, MODEL_AXIS)
    assert blocks["mlp"]["w_proj"] == P(None, MODEL_AXIS, None)
    assert specs["text"]["token_embedding"] == P()
    # no TP -> everything replicated
    specs1 = clip_param_specs(tiny_params, make_mesh(dp=8, tp=1))
    assert specs1["text"]["blocks"]["attn"]["w_qkv"] == P()


def test_dp_sharded_step_matches_single_device(
    tiny_cfg, tiny_params, tiny_prompt_cfg, rng
):
    learner, trainable, images, labels, mask = _setup(
        tiny_cfg, tiny_params, tiny_prompt_cfg, rng
    )
    opt = make_optimizer(TrainConfig(lr=1e-2))
    step = make_train_step(tiny_cfg, tiny_prompt_cfg, opt, use_image_feats=False)

    # single device
    state0 = init_train_state(trainable, opt)
    state_s, m_s = step(tiny_params, state0, learner.bank, images, labels, mask)

    # 8-way DP
    mesh = make_mesh(dp=8, tp=1)
    with mesh:
        params_d = shard_params(tiny_params, mesh)
        bank_d = replicate(learner.bank, mesh)
        state_d = replicate(init_train_state(trainable, opt), mesh)
        batch_d = shard_batch((images, labels, mask), mesh)
        state_d, m_d = step(params_d, state_d, bank_d, *batch_d)

    np.testing.assert_allclose(
        float(m_s["loss"]), float(m_d["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state_s.params["ctx"]),
        np.asarray(state_d.params["ctx"]),
        rtol=1e-4,
        atol=1e-6,
    )


def test_tp_sharded_step_matches_single_device(
    tiny_cfg, tiny_params, tiny_prompt_cfg, rng
):
    learner, trainable, images, labels, mask = _setup(
        tiny_cfg, tiny_params, tiny_prompt_cfg, rng
    )
    opt = make_optimizer(TrainConfig(lr=1e-2))
    step = make_train_step(tiny_cfg, tiny_prompt_cfg, opt, use_image_feats=False)

    state0 = init_train_state(trainable, opt)
    state_s, m_s = step(tiny_params, state0, learner.bank, images, labels, mask)

    mesh = make_mesh(dp=4, tp=2)
    with mesh:
        params_d = shard_params(tiny_params, mesh)
        bank_d = replicate(learner.bank, mesh)
        state_d = replicate(init_train_state(trainable, opt), mesh)
        batch_d = shard_batch((images, labels, mask), mesh)
        state_d, m_d = step(params_d, state_d, bank_d, *batch_d)

    np.testing.assert_allclose(float(m_s["loss"]), float(m_d["loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(state_s.params["ctx"]),
        np.asarray(state_d.params["ctx"]),
        rtol=1e-4,
        atol=1e-6,
    )


def test_batch_sharding_layout(tiny_cfg, rng):
    mesh = make_mesh(dp=8, tp=1)
    x = jnp.asarray(rng.standard_normal((16, 4)), jnp.float32)
    xs = shard_batch(x, mesh)
    assert xs.sharding.spec == P(DATA_AXIS)
    assert len(xs.sharding.device_set) == 8


def test_graft_dryrun_multichip():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_evaluate_cached_sharded(tiny_cfg, tiny_params, tiny_prompt_cfg, rng):
    """evaluate_cached(mesh=...) — the sharded batched inference pass —
    must produce identical accuracy to the unsharded path."""
    from tapclip_tpu.models.model_wrapper import FullModel
    from tapclip_tpu.trainer import CachedSet, evaluate_cached

    model = FullModel(
        ["A", "B", "C"], tiny_params, tiny_cfg, prompt_cfg=tiny_prompt_cfg
    )
    cached = CachedSet(
        feats=rng.standard_normal((64, tiny_cfg.embed_dim)).astype(np.float32),
        labels=rng.integers(0, 3, 64).astype(np.int32),
    )
    acc_single, pc_single = evaluate_cached(model, cached, batch_size=32)
    mesh = make_mesh(dp=8, tp=1)
    with mesh:
        acc_sharded, pc_sharded = evaluate_cached(model, cached, batch_size=32, mesh=mesh)
    assert acc_single == acc_sharded
    assert pc_single == pc_sharded
