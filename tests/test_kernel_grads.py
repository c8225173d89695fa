"""Gradient parity: Pallas backward kernels vs the XLA oracle.

Training keeps the fused kernels engaged end-to-end (no XLA escape):
``fused_mha`` and ``flash_attention``'s core have dedicated Pallas backward
kernels, the monolithic attention half-block has its own dedicated backward
(``_attn_block_bwd_kernel``, split-composition fallback when VMEM-tight),
and the MLP half-block has ``_mlp_bwd_kernel``.  These tests pin their
gradients to ``jax.grad`` through the plain-XLA reference implementations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapclip_tpu.ops.attention import attention_reference
from tapclip_tpu.ops.flash_attention import fused_attention
from tapclip_tpu.ops.fused_mha import (
    _attn_block_xla,
    _xla_reference,
    fused_attn_block,
    fused_mha,
)


def _loss_weights(rng, shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


@pytest.mark.parametrize(
    "B,T,H,Dh",
    [
        (2, 50, 2, 64),  # kernel path, one head-pair group
        (3, 197, 4, 64),  # ViT-like
        (2, 30, 2, 128),  # Dh == lane width
    ],
)
def test_fused_mha_grad_matches_xla(rng, B, T, H, Dh):
    qkv = jnp.asarray(rng.standard_normal((B, T, 3 * H * Dh)), jnp.float32)
    w = _loss_weights(rng, (B, T, H * Dh))

    def loss(fn):
        return lambda x: jnp.sum(fn(x) * w)

    g_kernel = jax.grad(loss(lambda x: fused_mha(x, H, interpret=True)))(qkv)
    g_ref = jax.grad(loss(lambda x: _xla_reference(x, H)))(qkv)
    np.testing.assert_allclose(
        np.asarray(g_kernel), np.asarray(g_ref), rtol=2e-4, atol=2e-4
    )


def test_fused_mha_grad_with_padded_keys(rng):
    B, T, H, Dh = 2, 50, 2, 64
    valid = 41
    qkv = jnp.asarray(rng.standard_normal((B, T, 3 * H * Dh)), jnp.float32)
    w = _loss_weights(rng, (B, T, H * Dh))

    g_kernel = jax.grad(
        lambda x: jnp.sum(fused_mha(x, H, valid_len=valid, interpret=True) * w)
    )(qkv)
    g_ref = jax.grad(lambda x: jnp.sum(_xla_reference(x, H, valid) * w))(qkv)
    np.testing.assert_allclose(
        np.asarray(g_kernel), np.asarray(g_ref), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("with_aux", [False, True])
def test_fused_attention_grad(rng, causal, with_aux):
    B, H, T, Dh = 2, 3, 26, 32
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, H, T, Dh)), jnp.float32) for _ in range(3)
    )
    valid = jnp.asarray([T, T - 7], jnp.int32)
    eot = jnp.asarray([T - 1, T - 9], jnp.int32) if with_aux else None
    w = _loss_weights(rng, (B, H, T, Dh))

    def kernel_loss(q, k, v):
        out, aux = fused_attention(
            q, k, v, causal=causal, kv_valid_len=valid, attn_to_idx=eot, interpret=True
        )
        # The model consumes aux under stop_gradient (reference detaches it).
        return jnp.sum(out * w)

    def ref_loss(q, k, v):
        out, _ = attention_reference(
            q, k, v, causal=causal, kv_valid_len=valid, attn_to_idx=None
        )
        return jnp.sum(out * w)

    gk = jax.grad(kernel_loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_fused_attn_block_grad(rng):
    """Monolithic forward kernel; backward through the split composition."""
    B, T, W, H = 2, 16, 256, 2
    x = jnp.asarray(rng.standard_normal((B, T, W)), jnp.float32)
    kp = jax.random.PRNGKey(3)
    from tapclip_tpu.models.layers import init_attn, init_layer_norm

    ln = init_layer_norm(W)
    attn = init_attn(kp, W)
    wl = _loss_weights(rng, (B, T, W))

    def kernel_loss(x, ln, attn):
        return jnp.sum(fused_attn_block(x, ln, attn, H, interpret=True) * wl)

    def ref_loss(x, ln, attn):
        out = _attn_block_xla(
            x, ln["scale"], ln["bias"], attn["w_qkv"], attn["b_qkv"],
            attn["w_out"], attn["b_out"], H, T, 1e-5,
        )
        return jnp.sum(out * wl)

    gk = jax.grad(kernel_loss, argnums=(0, 1, 2))(x, ln, attn)
    gr = jax.grad(ref_loss, argnums=(0, 1, 2))(x, ln, attn)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4)


def test_fused_attn_block_grad_multi_grid(rng):
    """Dedicated backward kernel with grid > 1: the grid-resident f32
    weight-grad accumulators must sum correctly across batch blocks, with
    padded keys masked."""
    B, T, W, H = 16, 24, 128, 2  # Dh=64 -> head groups of 2; grid = 2 blocks
    x = jnp.asarray(rng.standard_normal((B, T, W)), jnp.float32)
    from tapclip_tpu.models.layers import init_attn, init_layer_norm

    ln = init_layer_norm(W)
    attn = init_attn(jax.random.PRNGKey(5), W)
    wl = _loss_weights(rng, (B, T, W))
    valid = 19

    def kernel_loss(x, ln, attn):
        return jnp.sum(
            fused_attn_block(x, ln, attn, H, valid_len=valid, interpret=True)
            * wl
        )

    def ref_loss(x, ln, attn):
        out = _attn_block_xla(
            x, ln["scale"], ln["bias"], attn["w_qkv"], attn["b_qkv"],
            attn["w_out"], attn["b_out"], H, valid, 1e-5,
        )
        return jnp.sum(out * wl)

    gk = jax.grad(kernel_loss, argnums=(0, 1, 2))(x, ln, attn)
    gr = jax.grad(ref_loss, argnums=(0, 1, 2))(x, ln, attn)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=5e-4)


def test_attn_block_bwd_stage_batched_matches_serial(rng):
    """The stage-batched backward schedule (all heads per softmax-gradient
    stage; scripts/attn_bwd_ab.py) must produce the same gradients as the
    serial per-head chain — on chip they are bit-identical; interpret mode
    gets a tight tolerance."""
    from tapclip_tpu.ops.fused_mha import _attn_block_bwd_impl
    from tapclip_tpu.models.layers import init_attn, init_layer_norm

    B, T, W, H = 4, 24, 128, 2  # Dh=64 -> heads_per_group=2
    x = jnp.asarray(rng.standard_normal((B, T, W)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, T, W)), jnp.float32)
    ln = init_layer_norm(W)
    attn = init_attn(jax.random.PRNGKey(7), W)

    outs = {}
    for staged in (False, True):
        outs[staged] = _attn_block_bwd_impl(
            x, ln["scale"], ln["bias"], attn["w_qkv"], attn["b_qkv"],
            attn["w_out"], g, n_heads=H, valid=19, eps=1e-5, block_b=2,
            interpret=True, stage_batched=staged,
        )
    for a, b in zip(jax.tree.leaves(outs[False]), jax.tree.leaves(outs[True])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-6)


def test_attn_block_bwd_dw_interleave_matches_serial(rng):
    """The dw-interleaved backward schedule (round-5 VERDICT #4 probe —
    measured SLOWER on chip, kept in-tree as the falsification record and
    never auto-routed) must stay numerically pinned to the serial schedule:
    weight grads are the same slice-wise contractions (bit-identical on
    chip), dx/dgamma/dbeta differ only by the chunked dy accumulation
    order (f32 ulp)."""
    from tapclip_tpu.ops.fused_mha import (
        _attn_block_bwd_impl,
        _resolve_bwd_dw_interleave,
    )
    from tapclip_tpu.models.layers import init_attn, init_layer_norm

    # auto-routing must keep it OFF everywhere (measured negative)
    assert not _resolve_bwd_dw_interleave(12, 768)
    assert not _resolve_bwd_dw_interleave(16, 1024)
    # forcing it on requires >= 2 head groups
    assert _resolve_bwd_dw_interleave(4, 256, dw_interleave=True)
    assert not _resolve_bwd_dw_interleave(2, 128, dw_interleave=True)

    B, T, W, H = 4, 24, 256, 4  # Dh=64 -> 2 head groups
    x = jnp.asarray(rng.standard_normal((B, T, W)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, T, W)), jnp.float32)
    ln = init_layer_norm(W)
    attn = init_attn(jax.random.PRNGKey(7), W)

    # Pin dw_interleave against BOTH chain schedules it composes with —
    # the A/B harness exercises serial+dw and staged+dw.
    ref = _attn_block_bwd_impl(
        x, ln["scale"], ln["bias"], attn["w_qkv"], attn["b_qkv"],
        attn["w_out"], g, n_heads=H, valid=19, eps=1e-5, block_b=2,
        interpret=True, stage_batched=False, dw_interleave=False,
    )
    for staged in (False, True):
        out = _attn_block_bwd_impl(
            x, ln["scale"], ln["bias"], attn["w_qkv"], attn["b_qkv"],
            attn["w_out"], g, n_heads=H, valid=19, eps=1e-5, block_b=2,
            interpret=True, stage_batched=staged, dw_interleave=True,
        )
        for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)


def test_attn_block_bwd_pair_packed_matches_serial(rng):
    """The pair-packed backward chain (round-5: the round-4 forward pack
    applied to the softmax-attention gradient — every chain GEMM shares the
    lane-round-up structure) must match the serial per-head chain at f32
    ulp; the off-block lanes of the packed dv/dk products are garbage by
    construction and must be fully discarded by the selector."""
    from tapclip_tpu.ops.fused_mha import (
        _attn_block_bwd_impl,
        _resolve_bwd_pair_packed,
    )
    from tapclip_tpu.models.layers import init_attn, init_layer_norm

    # pair-packing requires exactly 2 heads per 128-lane group, non-causal
    assert _resolve_bwd_pair_packed(264, 1024, 16, pair_packed=True)
    assert not _resolve_bwd_pair_packed(264, 1024, 8, pair_packed=True)
    assert not _resolve_bwd_pair_packed(
        264, 1024, 16, pair_packed=True, causal=True)

    B, T, W, H = 4, 40, 256, 4  # Dh=64 -> 2 head pairs
    x = jnp.asarray(rng.standard_normal((B, T, W)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, T, W)), jnp.float32)
    ln = init_layer_norm(W)
    attn = init_attn(jax.random.PRNGKey(7), W)

    outs = {}
    for packed in (False, True):
        outs[packed] = _attn_block_bwd_impl(
            x, ln["scale"], ln["bias"], attn["w_qkv"], attn["b_qkv"],
            attn["w_out"], g, n_heads=H, valid=33, eps=1e-5, block_b=2,
            interpret=True, stage_batched=False, pair_packed=packed,
        )
    for a, b in zip(jax.tree.leaves(outs[False]), jax.tree.leaves(outs[True])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=2e-5)


def test_text_pass_grads_pallas_vs_xla(tiny_cfg, tiny_prompt_cfg, tiny_params, rng):
    """Full differentiated text pass (attribution -> adjust -> encode):
    pallas impl (interpret) vs xla impl, grads wrt the trainable pytree."""
    from tapclip_tpu.data.tokenizer import get_tokenizer
    from tapclip_tpu.models.model_wrapper import (
        init_trainable,
        text_features_with_attribution,
    )
    from tapclip_tpu.models.prompt_learner import PromptLearner

    learner = PromptLearner(
        ["Backpack", "Pen"],
        tiny_params,
        tiny_cfg,
        tiny_prompt_cfg,
        get_tokenizer(context_length=tiny_cfg.context_length),
    )
    trainable = init_trainable(jax.random.PRNGKey(1), learner, tiny_prompt_cfg)
    tgt = jnp.asarray(
        rng.standard_normal((learner.bank.ctx.shape[0], tiny_cfg.embed_dim)),
        jnp.float32,
    )

    def loss(trainable, impl):
        cfg = tiny_cfg.replace(attn_impl=impl)
        feats, _ = text_features_with_attribution(
            tiny_params, trainable["ctx"], learner.bank, cfg,
            tiny_prompt_cfg, trainable["adjustor"],
        )
        return jnp.sum(feats * tgt)

    g_pallas = jax.grad(loss)(trainable, "pallas")
    g_xla = jax.grad(loss)(trainable, "xla")
    for a, b in zip(jax.tree.leaves(g_pallas), jax.tree.leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_fused_attn_block_causal_grad(rng):
    """Monolithic block kernel + dedicated backward with the causal mask
    (text-tower training path)."""
    B, T, W, H = 4, 24, 128, 2
    x = jnp.asarray(rng.standard_normal((B, T, W)), jnp.float32)
    from tapclip_tpu.models.layers import init_attn, init_layer_norm

    ln = init_layer_norm(W)
    attn = init_attn(jax.random.PRNGKey(7), W)
    wl = _loss_weights(rng, (B, T, W))

    def kernel_loss(x, ln, attn):
        return jnp.sum(
            fused_attn_block(x, ln, attn, H, causal=True, interpret=True) * wl
        )

    def ref_loss(x, ln, attn):
        out = _attn_block_xla(
            x, ln["scale"], ln["bias"], attn["w_qkv"], attn["b_qkv"],
            attn["w_out"], attn["b_out"], H, T, 1e-5, causal=True,
        )
        return jnp.sum(out * wl)

    np.testing.assert_allclose(
        np.asarray(jax.jit(kernel_loss)(x, ln, attn)),
        np.asarray(ref_loss(x, ln, attn)), rtol=5e-5,
    )
    gk = jax.grad(kernel_loss, argnums=(0, 1, 2))(x, ln, attn)
    gr = jax.grad(ref_loss, argnums=(0, 1, 2))(x, ln, attn)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=5e-4)
