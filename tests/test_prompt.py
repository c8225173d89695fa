"""Prompt learner / adjustor / attribution monitor unit tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapclip_tpu.config import PromptConfig
from tapclip_tpu.data.tokenizer import get_tokenizer
from tapclip_tpu.models.attribution_monitor import (
    attribution_entropy,
    attribution_scores,
    attribution_variance,
)
from tapclip_tpu.models.prompt_adjustor import adjust_prompt, init_adjustor_params
from tapclip_tpu.models.prompt_learner import PromptLearner, build_prompts


@pytest.fixture()
def learner(tiny_cfg, tiny_params, tiny_prompt_cfg):
    return PromptLearner(
        ["Backpack", "Pen"],
        tiny_params,
        tiny_cfg,
        tiny_prompt_cfg,
        get_tokenizer(context_length=tiny_cfg.context_length),
    )


class TestPromptLearner:
    def test_shapes_and_mask(self, learner, tiny_cfg, tiny_prompt_cfg):
        P, D = tiny_prompt_cfg.prompt_len, tiny_cfg.text_width
        assert learner.n_cls == 2
        assert learner.bank.ctx.shape == (tiny_prompt_cfg.max_classes, P, D)
        assert learner.bank.class_mask.sum() == 2
        prompts = learner()
        assert prompts.shape == (2, P + tiny_cfg.context_length, D)

    def test_ctx_init_copies_template_positions(self, learner, tiny_cfg, tiny_prompt_cfg):
        # prompt_learner.py:37-39: ctx_init = token_emb[5:5+P]
        P = tiny_prompt_cfg.prompt_len
        np.testing.assert_allclose(
            np.asarray(learner.bank.ctx[0]),
            np.asarray(learner.bank.token_embs[0, 5 : 5 + P]),
        )

    def test_add_class_idempotent(self, learner):
        learner.add_class_prompt("Backpack")  # prompt_learner.py:27-28
        assert learner.n_cls == 2
        learner.add_class_prompt("Clipboards")
        assert learner.n_cls == 3
        assert learner.class_names[-1] == "Clipboards"

    def test_capacity_growth(self, tiny_cfg, tiny_params):
        pcfg = PromptConfig(max_classes=2)
        lp = PromptLearner(
            ["A", "B"],
            tiny_params,
            tiny_cfg,
            pcfg,
            get_tokenizer(context_length=tiny_cfg.context_length),
        )
        lp.add_class_prompt("C")  # exceeds capacity -> grows, no error
        assert lp.n_cls == 3
        assert lp.bank.capacity > 2
        assert bool(lp.bank.class_mask[2])

    def test_ctx_roundtrip_by_name(self, learner):
        d = learner.ctx_by_name()
        assert set(d) == {"Backpack", "Pen"}
        d["Pen"] = d["Pen"] + 1.0
        learner.load_ctx(d)
        np.testing.assert_allclose(np.asarray(learner.bank.ctx[1]), d["Pen"])

    def test_load_ctx_with_unseen_class_keeps_loaded_vectors(self, learner):
        """A checkpoint with an extra class must not revert the other
        classes' vectors (the add replaces the bank mid-load; regression
        test for the interleaved add/set bug)."""
        d = learner.ctx_by_name()
        d["Backpack"] = d["Backpack"] + 1.0
        d["Pen"] = d["Pen"] + 2.0
        # new class LAST in iteration order: the adds must happen up front
        d["Mug"] = np.full_like(d["Pen"], 3.0)
        learner.load_ctx(d)
        assert learner.n_cls == 3
        np.testing.assert_allclose(np.asarray(learner.bank.ctx[0]), d["Backpack"])
        np.testing.assert_allclose(np.asarray(learner.bank.ctx[1]), d["Pen"])
        np.testing.assert_allclose(
            np.asarray(learner.bank.ctx[learner.class_names.index("Mug")]),
            d["Mug"],
        )

    def test_eot_pos_recorded(self, learner):
        eot = np.asarray(learner.bank.eot_pos[:2])
        assert (eot > 0).all()
        tok = learner.tokenizer
        ids = tok.tokenize(["a photo of a Backpack"], learner.clip_cfg.context_length)[0]
        assert eot[0] == ids.argmax()


class TestAttributionMonitor:
    def test_slice_and_softmax(self, rng):
        col = jnp.asarray(rng.standard_normal((3, 12)), jnp.float32)
        attr = attribution_scores(col, prompt_len=5, normalize=True)
        assert attr.shape == (3, 5)
        np.testing.assert_allclose(np.asarray(attr.sum(-1)), np.ones(3), rtol=1e-5)
        raw = attribution_scores(col, 5, normalize=False)
        np.testing.assert_allclose(np.asarray(raw), np.asarray(col[:, :5]))

    def test_entropy_uniform_is_max(self):
        uniform = jnp.full((1, 4), 0.25)
        peaked = jnp.asarray([[0.97, 0.01, 0.01, 0.01]])
        assert float(attribution_entropy(uniform)) > float(attribution_entropy(peaked))

    def test_variance_grouped(self):
        attr = jnp.asarray([[0.5, 0.5], [0.3, 0.7], [0.2, 0.8], [0.2, 0.8]])
        labels = jnp.asarray([0, 0, 1, 1])
        v = float(attribution_variance(attr, labels, n_classes=2))
        # group 0 variance (unbiased): var([.5,.3])=.02, var([.5,.7])=.02 -> mean .02
        # group 1: identical rows -> 0; mean over groups = .01
        np.testing.assert_allclose(v, 0.01, rtol=1e-5)


class TestPromptAdjustor:
    def test_scale(self, rng):
        p = jnp.asarray(rng.standard_normal((2, 5, 8)), jnp.float32)
        a = jnp.asarray(rng.uniform(size=(2, 5)), jnp.float32)
        out = adjust_prompt({}, "scale", p, a)
        np.testing.assert_allclose(np.asarray(out), np.asarray(p * a[..., None]), rtol=1e-6)

    @pytest.mark.parametrize("method", ["gate", "residual"])
    def test_mlp_methods_shapes(self, method, rng):
        params = init_adjustor_params(jax.random.PRNGKey(0), method, dim=8)
        p = jnp.asarray(rng.standard_normal((3, 5, 8)), jnp.float32)
        a = jnp.asarray(rng.uniform(size=(3, 5)), jnp.float32)
        out = adjust_prompt(params, method, p, a)
        assert out.shape == p.shape
        if method == "gate":
            # gate in (0,1): |out| <= |p|
            assert (np.abs(np.asarray(out)) <= np.abs(np.asarray(p)) + 1e-6).all()

    def test_scale_params_empty(self):
        assert init_adjustor_params(jax.random.PRNGKey(0), "scale", 8) == {}

    def test_unknown_method_raises(self, rng):
        with pytest.raises(ValueError):
            adjust_prompt({}, "nope", jnp.zeros((1, 2, 3)), jnp.zeros((1, 2)))


def test_build_prompts_concat(rng):
    ctx = jnp.asarray(rng.standard_normal((2, 5, 8)), jnp.float32)
    tok = jnp.asarray(rng.standard_normal((2, 16, 8)), jnp.float32)
    out = build_prompts(ctx, tok)
    assert out.shape == (2, 21, 8)
    np.testing.assert_allclose(np.asarray(out[:, :5]), np.asarray(ctx))
    np.testing.assert_allclose(np.asarray(out[:, 5:]), np.asarray(tok))
