"""Mixture-of-experts tests (models/moe.py).

Pins the Switch top-1 routed MLP to the dense MLP in the E=1 limit, the
static-capacity drop semantics, the load-balance loss value, tower + pretrain
integration, and expert-parallel sharded equivalence on the virtual mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tapclip_tpu.config import TINY_TEST
from tapclip_tpu.models import clip as C
from tapclip_tpu.models import layers
from tapclip_tpu.models import moe
from tapclip_tpu.parallel.mesh import MODEL_AXIS, make_mesh
from tapclip_tpu.parallel.sharding import (
    clip_param_specs,
    replicate,
    shard_batch,
    shard_params,
)
from tapclip_tpu.pretrain import make_pretrain_step

MOE_CFG = TINY_TEST.replace(moe_experts=4)


def test_expert_capacity():
    # ceil(T/E * cf), sublane-rounded, capped at the group size
    assert moe.expert_capacity(32, 4, 1.0) == 8
    assert moe.expert_capacity(32, 4, 1.3) == 16  # ceil(10.4) -> 11 -> 16
    assert moe.expert_capacity(8, 8, 1.0) == 8  # floor of 8
    assert moe.expert_capacity(16, 1, 4.0) == 16  # never beyond the group
    assert moe.expert_capacity(12, 1, 4.0) == 12  # cap is exact, not rounded
    assert moe.expert_capacity(5, 4, 1.25) == 5  # tiny groups stay <= T


def test_pad_tokens_do_not_route(rng):
    """Tower-level zero pads must not reach the router: they would tie the
    softmax, argmax-route to expert 0, eat capacity, and bias f/p_bar."""
    W, H, T, B, E, V = 16, 32, 16, 2, 4, 12
    p = moe.init_moe_mlp(jax.random.PRNGKey(0), W, H, E)
    p["router"]["w"] = jnp.zeros_like(p["router"]["w"])
    x = jnp.asarray(rng.standard_normal((B, T, W)), jnp.float32)
    x = x.at[:, V:].set(0.0)  # tower-style zero pad rows
    y, lb = moe.moe_mlp_forward(x, p, "gelu", capacity_factor=1.0, valid_len=V)
    # capacity computed over VALID tokens: ceil(12/4)=3 -> 8
    C = moe.expert_capacity(V, E, 1.0)
    assert C == 8
    # pads produce exactly zero output and consume no capacity slots
    np.testing.assert_array_equal(np.asarray(y[:, V:]), 0.0)
    # all 12 valid tokens route to expert 0; only the first 8 fit
    np.testing.assert_array_equal(np.asarray(y[:, C:V]), 0.0)
    assert float(jnp.max(jnp.abs(y[:, :C]))) > 0.0
    # lb statistics over valid tokens only: still exactly 1 at uniform probs
    np.testing.assert_allclose(float(lb), 1.0, rtol=1e-6)


def test_single_expert_equals_dense(rng):
    W, H, T, B = 16, 64, 8, 4
    p = moe.init_moe_mlp(jax.random.PRNGKey(0), W, H, n_experts=1)
    x = jnp.asarray(rng.standard_normal((B, T, W)), jnp.float32)
    y, lb = moe.moe_mlp_forward(x, p, "gelu", capacity_factor=2.0)
    dense_p = {
        "w_fc": p["w_fc"][0],
        "b_fc": p["b_fc"][0],
        "w_proj": p["w_proj"][0],
        "b_proj": p["b_proj"][0],
    }
    ref = layers.mlp_forward(x, dense_p, "gelu")
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-5, atol=1e-5)
    # one expert: perfectly "balanced" by definition
    np.testing.assert_allclose(float(lb), 1.0, rtol=1e-6)


def test_zero_router_routes_all_to_first_expert_lb_one(rng):
    W, H, T, B, E = 16, 32, 32, 2, 4
    p = moe.init_moe_mlp(jax.random.PRNGKey(0), W, H, E)
    p["router"]["w"] = jnp.zeros_like(p["router"]["w"])
    x = jnp.asarray(rng.standard_normal((B, T, W)), jnp.float32)
    y, lb = moe.moe_mlp_forward(x, p, "gelu", capacity_factor=1.0)
    # uniform probs -> argmax ties break to expert 0 -> f=(1,0,0,0),
    # p_bar=(1/4,...): lb = E * 1 * 1/4 = 1 exactly
    np.testing.assert_allclose(float(lb), 1.0, rtol=1e-6)
    # capacity C = ceil(32/4)=8: tokens 8+ overflow and output exactly 0
    C = moe.expert_capacity(T, E, 1.0)
    assert C == 8
    np.testing.assert_array_equal(np.asarray(y[:, C:]), 0.0)
    assert float(jnp.max(jnp.abs(y[:, :C]))) > 0.0


def test_moe_tower_forward_and_aux(rng):
    params = C.init_clip_params(jax.random.PRNGKey(0), MOE_CFG)
    # param tree carries expert banks
    assert params["visual"]["blocks"]["moe"]["w_fc"].shape == (
        MOE_CFG.vision_layers, 4, 64, 256,
    )
    images = jnp.asarray(
        rng.standard_normal((4, MOE_CFG.image_size, MOE_CFG.image_size, 3)),
        jnp.float32,
    )
    aux = []
    feats = C.encode_image(params, MOE_CFG, images, moe_loss_out=aux)
    assert feats.shape == (4, MOE_CFG.embed_dim)
    assert np.isfinite(np.asarray(feats)).all()
    assert len(aux) == 1 and np.isfinite(float(aux[0]))
    # layer-summed lb of a near-uniform router is near n_layers * 1.0
    assert 0.5 * MOE_CFG.vision_layers < float(aux[0]) < 4.0 * MOE_CFG.vision_layers

    ids = jnp.asarray(
        rng.integers(1, MOE_CFG.vocab_size - 2, (4, MOE_CFG.context_length)),
        jnp.int32,
    )
    aux2 = []
    tfeats = C.encode_text(params, MOE_CFG, ids, moe_loss_out=aux2)
    assert np.isfinite(np.asarray(tfeats)).all() and len(aux2) == 1


def test_moe_pretrain_step_learns(rng):
    params = C.init_clip_params(jax.random.PRNGKey(0), MOE_CFG)
    opt = optax.adam(1e-3)
    step = make_pretrain_step(MOE_CFG, opt)
    opt_state = opt.init(params)
    images = jnp.asarray(
        rng.standard_normal((4, MOE_CFG.image_size, MOE_CFG.image_size, 3)),
        jnp.float32,
    )
    ids = jnp.asarray(
        rng.integers(1, MOE_CFG.vocab_size - 2, (4, MOE_CFG.context_length)),
        jnp.int32,
    )
    losses = []
    for _ in range(8):
        params, opt_state, m = step(params, opt_state, images, ids)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_moe_router_gets_gradient(rng):
    """Top-1 gating is differentiable through the selected prob — the router
    must receive a nonzero gradient from the task loss."""
    from tapclip_tpu.pretrain import contrastive_loss_local

    params = C.init_clip_params(jax.random.PRNGKey(0), MOE_CFG)
    images = jnp.asarray(
        rng.standard_normal((4, MOE_CFG.image_size, MOE_CFG.image_size, 3)),
        jnp.float32,
    )
    ids = jnp.asarray(
        rng.integers(1, MOE_CFG.vocab_size - 2, (4, MOE_CFG.context_length)),
        jnp.int32,
    )

    def loss(p):
        img = C.encode_image(p, MOE_CFG, images)
        txt = C.encode_text(p, MOE_CFG, ids)
        return contrastive_loss_local(img, txt, p["logit_scale"])

    g = jax.grad(loss)(params)
    gr = g["visual"]["blocks"]["moe"]["router"]["w"]
    assert np.isfinite(np.asarray(gr)).all()
    assert float(jnp.max(jnp.abs(gr))) > 0.0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_moe_ep_sharded_matches_single_device(rng):
    """Expert-parallel (experts over 'model') sharded pretrain step == the
    unsharded loss, and the specs place the expert axis on the model axis."""
    params = C.init_clip_params(jax.random.PRNGKey(0), MOE_CFG)
    mesh = make_mesh(dp=4, tp=2)
    specs = clip_param_specs(params, mesh)
    ws = specs["visual"]["blocks"]["moe"]["w_fc"]
    assert ws == jax.sharding.PartitionSpec(None, MODEL_AXIS, None, None)
    assert specs["visual"]["blocks"]["moe"]["router"]["w"] == (
        jax.sharding.PartitionSpec()
    )

    opt = optax.adam(1e-3)
    B = 16
    images = jnp.asarray(
        rng.standard_normal((B, MOE_CFG.image_size, MOE_CFG.image_size, 3)),
        jnp.float32,
    )
    ids = jnp.asarray(
        rng.integers(1, MOE_CFG.vocab_size - 2, (B, MOE_CFG.context_length)),
        jnp.int32,
    )
    fresh = lambda: jax.tree.map(jnp.array, params)

    step0 = make_pretrain_step(MOE_CFG, opt)
    _, _, m0 = step0(fresh(), opt.init(params), images, ids)

    step = make_pretrain_step(MOE_CFG, opt, mesh=mesh)
    with mesh:
        p = shard_params(fresh(), mesh)
        s = replicate(opt.init(params), mesh)
        b = shard_batch((images, ids), mesh)
        _, _, m = step(p, s, *b)
    np.testing.assert_allclose(float(m["loss"]), float(m0["loss"]), rtol=1e-4)


def test_moe_unsupported_paths_fail_loudly():
    with pytest.raises(NotImplementedError, match="ViT"):
        C.init_clip_params(
            jax.random.PRNGKey(0),
            MOE_CFG.replace(vision_tower="resnet", resnet_layers=(1, 1, 1, 1)),
        )


def test_moe_prompt_tuning_full_pipeline(rng, tiny_prompt_cfg):
    """The full TAP-CLIP prompt-tuning pipeline (attribution pass + adjust +
    class-batched encode + CE loss + ctx gradient) runs on MoE towers."""
    from tapclip_tpu.data.tokenizer import get_tokenizer
    from tapclip_tpu.models.model_wrapper import (
        full_model_forward,
        init_trainable,
    )
    from tapclip_tpu.models.prompt_learner import PromptLearner

    params = C.init_clip_params(jax.random.PRNGKey(0), MOE_CFG)
    learner = PromptLearner(
        ["A", "B", "C"], params, MOE_CFG, tiny_prompt_cfg,
        get_tokenizer(context_length=MOE_CFG.context_length),
    )
    trainable = init_trainable(jax.random.PRNGKey(1), learner, tiny_prompt_cfg)
    images = jnp.asarray(
        rng.standard_normal((4, MOE_CFG.image_size, MOE_CFG.image_size, 3)),
        jnp.float32,
    )
    labels = jnp.asarray(rng.integers(0, 3, 4), jnp.int32)

    def loss_fn(ctx):
        out = full_model_forward(
            params, {**trainable, "ctx": ctx}, learner.bank, images, labels,
            clip_cfg=MOE_CFG, prompt_cfg=tiny_prompt_cfg, with_loss=True,
        )
        return out["loss"], out

    (loss, out), g = jax.value_and_grad(loss_fn, has_aux=True)(trainable["ctx"])
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(out["logits"])).all()
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0.0
