"""Train/eval step tests: loss decreases, reference-parity of the optimized
set (ctx only), masked batches, feature caching, mid-training determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapclip_tpu.config import TrainConfig
from tapclip_tpu.data.tokenizer import get_tokenizer
from tapclip_tpu.models import clip as C
from tapclip_tpu.models.model_wrapper import init_trainable
from tapclip_tpu.models.prompt_learner import PromptLearner
from tapclip_tpu.parallel.train_step import (
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)


@pytest.fixture()
def setup(tiny_cfg, tiny_params, tiny_prompt_cfg, rng):
    learner = PromptLearner(
        ["A", "B", "C"],
        tiny_params,
        tiny_cfg,
        tiny_prompt_cfg,
        get_tokenizer(context_length=tiny_cfg.context_length),
    )
    trainable = init_trainable(jax.random.PRNGKey(0), learner, tiny_prompt_cfg)
    feats = jnp.asarray(rng.standard_normal((12, tiny_cfg.embed_dim)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 3, 12), jnp.int32)
    mask = jnp.ones((12,), bool)
    return learner, trainable, feats, labels, mask


def test_loss_decreases(setup, tiny_cfg, tiny_prompt_cfg, tiny_params):
    learner, trainable, feats, labels, mask = setup
    opt = make_optimizer(TrainConfig(lr=5e-2))
    state = init_train_state(trainable, opt)
    step = make_train_step(tiny_cfg, tiny_prompt_cfg, opt)
    losses = []
    for _ in range(20):
        state, m = step(tiny_params, state, learner.bank, feats, labels, mask)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7
    assert int(state.step) == 20


def test_only_ctx_updates(setup, tiny_cfg, tiny_prompt_cfg, tiny_params):
    """Reference parity: AdamW over prompt params only (train.py:65-67)."""
    learner, trainable, feats, labels, mask = setup
    opt = make_optimizer(TrainConfig(lr=5e-2))
    state = init_train_state(trainable, opt)
    step = make_train_step(tiny_cfg, tiny_prompt_cfg, opt)
    state2, _ = step(tiny_params, state, learner.bank, feats, labels, mask)
    assert not np.allclose(np.asarray(state2.params["ctx"]), np.asarray(trainable["ctx"]))
    np.testing.assert_allclose(
        np.asarray(state2.params["logit_scale"]), np.asarray(trainable["logit_scale"])
    )


def test_padded_rows_dont_affect_grads(setup, tiny_cfg, tiny_prompt_cfg, tiny_params):
    learner, trainable, feats, labels, mask = setup
    opt = make_optimizer(TrainConfig(lr=1e-2))
    step = make_train_step(tiny_cfg, tiny_prompt_cfg, opt)

    state_a = init_train_state(trainable, opt)
    state_a, _ = step(tiny_params, state_a, learner.bank, feats, labels, mask)

    # pad 4 garbage rows with mask=False -> identical update
    feats_p = jnp.concatenate([feats, jnp.full((4, feats.shape[1]), 1e3)], axis=0)
    labels_p = jnp.concatenate([labels, jnp.zeros((4,), jnp.int32)])
    mask_p = jnp.concatenate([mask, jnp.zeros((4,), bool)])
    state_b = init_train_state(trainable, opt)
    state_b, _ = step(tiny_params, state_b, learner.bank, feats_p, labels_p, mask_p)

    np.testing.assert_allclose(
        np.asarray(state_a.params["ctx"]), np.asarray(state_b.params["ctx"]),
        rtol=1e-5, atol=1e-6,
    )


def test_eval_step_counts(setup, tiny_cfg, tiny_prompt_cfg, tiny_params):
    learner, trainable, feats, labels, mask = setup
    estep = make_eval_step(tiny_cfg, tiny_prompt_cfg)
    out = estep(tiny_params, trainable, learner.bank, feats, labels, mask)
    assert int(out["total"]) == 12
    assert 0 <= int(out["correct"]) <= 12
    assert int(out["per_class_total"].sum()) == 12
    assert int(out["per_class_correct"].sum()) == int(out["correct"])


def test_trainable_keys_widening(setup, tiny_cfg, tiny_params, tiny_prompt_cfg):
    import dataclasses

    learner, _, feats, labels, mask = setup
    pcfg = dataclasses.replace(tiny_prompt_cfg, adjustor_method="gate")
    trainable = init_trainable(jax.random.PRNGKey(0), learner, pcfg)
    opt = make_optimizer(TrainConfig(lr=1e-2))
    state = init_train_state(trainable, opt, trainable_keys=("ctx", "adjustor"))
    step = make_train_step(tiny_cfg, pcfg, opt, trainable_keys=("ctx", "adjustor"))
    state2, m = step(tiny_params, state, learner.bank, feats, labels, mask)
    assert np.isfinite(float(m["loss"]))
    w1_before = np.asarray(trainable["adjustor"]["w1"])
    w1_after = np.asarray(state2.params["adjustor"]["w1"])
    assert not np.allclose(w1_before, w1_after)
