"""Gradient + training-trajectory parity vs a torch oracle.

tests/test_full_model_oracle.py pins the FORWARD of the fused pipeline
against a loop-for-loop torch reimplementation of
``/root/reference/models/model_wrapper.py:28-100``.  This file pins the
TRAINING semantics — the part the accuracy north star actually exercises:

* d loss / d ctx through the second text pass (the reference's autograd
  path, ``train.py:99-105``; the attribution pass contributes nothing —
  its hook detaches the attention map, ``clip_wrapper.py:36``);
* d loss / d adjustor-params for the 'gate' and 'residual' adjustors
  (``prompt_adjustor.py:9-24,38-44``), plus their forward parity;
* a 5-step AdamW trajectory (matched lr/wd/betas/eps, identical data)
  comparing final context vectors and validation logits — torch
  ``optim.AdamW`` over the context bank exactly as ``train.py:65-67``
  vs this repo's jitted ``make_train_step``;
* forward + gradient parity for the image-conditioned (CoCoOp meta-net)
  path, where attribution is genuinely per-(sample, class) ``[B, C, P]``.

Everything runs in f32 on CPU.  Image features enter both sides as the
same raw arrays (the image tower is frozen and outside the gradient path;
its parity is pinned in tests/test_clip_model.py), isolating the text /
attribution / adjustor / optimizer chain under test.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tapclip_tpu.config import TrainConfig
from tapclip_tpu.models.model_wrapper import full_model_forward
from tapclip_tpu.models.prompt_adjustor import init_adjustor_params
from tapclip_tpu.models.prompt_learner import PromptLearner
from tapclip_tpu.parallel.train_step import (
    init_train_state,
    make_optimizer,
    make_train_step,
)

from tests.test_clip_model import TorchCLIP
from tests.test_full_model_oracle import CFG, CLASSES, PCFG, TOKENIZER

LOGIT_SCALE = float(np.exp(np.log(1 / 0.07)))


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(7)
    m = TorchCLIP(CFG).eval()
    # The reference freezes every CLIP weight (clip_wrapper.py:20-21).
    for p in m.parameters():
        p.requires_grad_(False)
    return m


@pytest.fixture(scope="module")
def jax_params(torch_model):
    from tapclip_tpu.utils.torch_convert import convert_openclip_state_dict

    return jax.tree.map(
        jnp.asarray,
        convert_openclip_state_dict(torch_model.openclip_state_dict(), CFG),
    )


@pytest.fixture(scope="module")
def learner(jax_params):
    return PromptLearner(CLASSES, jax_params, CFG, PCFG, TOKENIZER)


def _class_token_embs(torch_model):
    """Frozen per-class template embeddings [C][T_tok, D] (prompt_learner.py:28-35)."""
    out = []
    for name in CLASSES:
        ids = torch.from_numpy(
            TOKENIZER.tokenize([PCFG.template.format(name)], CFG.context_length)
        ).long()[0]
        out.append(torch_model.token_embedding.weight[ids].detach())
    return out


def _torch_adjust(method, adj, prompt_embed, attribution):
    """prompt_adjustor.py:31-44 on raw tensors (weights shared with jax)."""
    a = attribution[..., None]
    if method == "scale":
        return prompt_embed * a
    h = torch.relu(a @ adj["w1"] + adj["b1"])
    out = h @ adj["w2"] + adj["b2"]
    if method == "gate":
        return prompt_embed * torch.sigmoid(out)
    if method == "residual":
        return prompt_embed + out
    raise ValueError(method)


def _torch_forward(torch_model, ctx_list, feats, labels, *, method="scale",
                   adj=None, pi=None):
    """Grad-enabled torch reimplementation of the reference forward
    (model_wrapper.py:28-100): per-class loop, per-sample attribution under
    no_grad (the hook detaches, clip_wrapper.py:36), adjust, second pass,
    T-1 pooling, projection, normalize, logit scale, CE.

    ``ctx_list``: C tensors [P, D] (leaves; requires_grad as the caller set).
    ``feats``: [B, E] raw image features. ``pi``: optional [B, D] per-sample
    context shift (the image-conditioned meta-net output, grad-enabled).
    """
    P = PCFG.prompt_len
    blocks = torch_model.transformer.resblocks
    toks = _class_token_embs(torch_model)

    img = feats / feats.norm(dim=-1, keepdim=True)
    B = img.shape[0]

    def attn_probs_last(x):
        for blk in blocks[:-1]:
            x = blk(x)
        y = blocks[-1].ln_1(x)
        _, w = blocks[-1].attn(y, y, y, need_weights=True,
                               average_attn_weights=True)
        return w

    def raw_transformer(x):
        for blk in blocks:
            x = blk(x)
        return x

    logits_cols, attr_cols = [], []
    for i in range(len(CLASSES)):
        ctx = ctx_list[i][None].expand(B, -1, -1)  # [B, P, D]
        if pi is not None:
            ctx = ctx + pi[:, None, :]
        tok = toks[i][None].expand(B, -1, -1)
        full = torch.cat([ctx, tok], dim=1)
        T = full.shape[1]
        with torch.no_grad():
            rows = []
            for b in range(B):  # HOT LOOP 2 (model_wrapper.py:55-65)
                w = attn_probs_last(full[b : b + 1])
                rows.append(F.softmax(w[0, :P, T - 1], dim=-1))
            attribution = torch.stack(rows)  # [B, P], detached
        adjusted = _torch_adjust(method, adj, ctx, attribution)
        full2 = torch.cat([adjusted, tok], dim=1)
        x2 = raw_transformer(full2)
        feat = x2[:, -1] @ torch_model.text_projection
        feat = feat / feat.norm(dim=-1, keepdim=True)
        logits_cols.append(LOGIT_SCALE * (img * feat).sum(dim=-1))
        attr_cols.append(attribution)
    logits = torch.stack(logits_cols, dim=1)  # [B, C]
    loss = F.cross_entropy(logits, labels)
    return logits, loss, torch.stack(attr_cols, dim=1)  # attrs [B, C, P]


def _jax_trainable(learner, adjustor=None, meta_net=None):
    t = {
        "ctx": learner.bank.ctx,
        "adjustor": {} if adjustor is None else adjustor,
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
    }
    if meta_net is not None:
        t["meta_net"] = meta_net
    return t


def _torch_ctx_leaves(learner, requires_grad=True):
    return [
        torch.from_numpy(np.array(learner.bank.ctx[i]))
        .requires_grad_(requires_grad)
        for i in range(len(CLASSES))
    ]


def _batch(rng, B=4):
    feats = rng.standard_normal((B, CFG.embed_dim)).astype(np.float32)
    labels = rng.integers(0, len(CLASSES), B).astype(np.int64)
    return feats, labels


# ---------------------------------------------------------------------------
# d loss / d ctx — scale adjustor (the path every reference driver trains)
# ---------------------------------------------------------------------------


def test_ctx_grad_parity_scale(torch_model, learner, jax_params, rng):
    feats, labels = _batch(rng)
    ctx_t = _torch_ctx_leaves(learner)
    _, loss, _ = _torch_forward(
        torch_model, ctx_t, torch.from_numpy(feats), torch.from_numpy(labels)
    )
    loss.backward()
    ref_grads = np.stack([c.grad.numpy() for c in ctx_t])  # [C, P, D]

    def jax_loss(ctx):
        t = dict(_jax_trainable(learner), ctx=ctx)
        out = full_model_forward(
            jax_params, t, learner.bank, None,
            jnp.asarray(labels.astype(np.int32)),
            clip_cfg=CFG, prompt_cfg=PCFG, with_loss=True,
            image_feats=jnp.asarray(feats),
        )
        return out["loss"]

    g = np.asarray(jax.grad(jax_loss)(learner.bank.ctx))
    C = len(CLASSES)
    np.testing.assert_allclose(g[:C], ref_grads, rtol=2e-4, atol=1e-6)
    # Padded class rows must receive exactly zero gradient.
    assert np.all(g[C:] == 0.0)


# ---------------------------------------------------------------------------
# gate / residual adjustors: forward + grads (ctx AND adjustor params)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("method", ["gate", "residual"])
def test_adjustor_forward_and_grad_parity(torch_model, learner, jax_params,
                                          rng, method):
    pcfg = dataclasses.replace(PCFG, adjustor_method=method)
    adj_j = init_adjustor_params(jax.random.PRNGKey(3), method, CFG.text_width)
    adj_t = {
        k: torch.from_numpy(np.asarray(v)).clone().requires_grad_(True)
        for k, v in adj_j.items()
    }
    feats, labels = _batch(rng)
    ctx_t = _torch_ctx_leaves(learner)
    ref_logits, loss, _ = _torch_forward(
        torch_model, ctx_t, torch.from_numpy(feats),
        torch.from_numpy(labels), method=method, adj=adj_t,
    )
    loss.backward()
    ref_ctx_g = np.stack([c.grad.numpy() for c in ctx_t])
    ref_adj_g = {k: v.grad.numpy() for k, v in adj_t.items()}

    def jax_loss(ctx, adj):
        t = dict(_jax_trainable(learner, adjustor=adj), ctx=ctx)
        out = full_model_forward(
            jax_params, t, learner.bank, None,
            jnp.asarray(labels.astype(np.int32)),
            clip_cfg=CFG, prompt_cfg=pcfg, with_loss=True,
            image_feats=jnp.asarray(feats),
        )
        return out["loss"], out["logits"]

    g_ctx, g_adj = jax.grad(jax_loss, argnums=(0, 1), has_aux=True)(
        learner.bank.ctx, adj_j
    )[0]
    _, logits = jax_loss(learner.bank.ctx, adj_j)

    C = len(CLASSES)
    np.testing.assert_allclose(
        np.asarray(logits)[:, :C], ref_logits.detach().numpy(),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(np.asarray(g_ctx)[:C], ref_ctx_g,
                               rtol=2e-4, atol=1e-6)
    for k in ref_adj_g:
        np.testing.assert_allclose(
            np.asarray(g_adj[k]), ref_adj_g[k], rtol=2e-4, atol=1e-6,
            err_msg=f"adjustor grad mismatch: {k}",
        )


# ---------------------------------------------------------------------------
# 5-step AdamW trajectory (train.py:65-67,95-105 semantics)
# ---------------------------------------------------------------------------


def test_adamw_trajectory_parity(torch_model, learner, jax_params, rng):
    """Five optimizer steps on identical data: final ctx and val logits must
    coincide. torch.optim.AdamW(prompt params, lr=2e-3, wd=0.01) vs
    optax.adamw inside the jitted train step (matched betas/eps)."""
    steps = 5
    batches = [_batch(rng) for _ in range(steps)]
    val_feats, val_labels = _batch(rng, B=6)

    # --- torch side -------------------------------------------------------
    ctx_t = _torch_ctx_leaves(learner)
    opt = torch.optim.AdamW(ctx_t, lr=2e-3, weight_decay=0.01)
    for feats, labels in batches:
        _, loss, _ = _torch_forward(
            torch_model, ctx_t, torch.from_numpy(feats),
            torch.from_numpy(labels),
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
    ref_ctx = np.stack([c.detach().numpy() for c in ctx_t])
    with torch.no_grad():
        ref_val_logits, _, _ = _torch_forward(
            torch_model, [c.detach() for c in ctx_t],
            torch.from_numpy(val_feats), torch.from_numpy(val_labels),
        )

    # --- jax side ---------------------------------------------------------
    tc = TrainConfig(lr=2e-3, weight_decay=0.01)
    optimizer = make_optimizer(tc)
    trainable = _jax_trainable(learner)
    state = init_train_state(trainable, optimizer)
    step = make_train_step(CFG, PCFG, optimizer)
    mask = jnp.ones((4,), bool)
    for feats, labels in batches:
        state, _ = step(
            jax_params, state, learner.bank, jnp.asarray(feats),
            jnp.asarray(labels.astype(np.int32)), mask,
        )
    C = len(CLASSES)
    ctx_j = np.asarray(state.params["ctx"])
    np.testing.assert_allclose(ctx_j[:C], ref_ctx, rtol=1e-4, atol=5e-6)

    out = full_model_forward(
        jax_params, state.params, learner.bank, None,
        jnp.asarray(val_labels.astype(np.int32)),
        clip_cfg=CFG, prompt_cfg=PCFG, with_loss=True,
        image_feats=jnp.asarray(val_feats),
    )
    np.testing.assert_allclose(
        np.asarray(out["logits"])[:, :C], ref_val_logits.detach().numpy(),
        rtol=5e-4, atol=5e-4,
    )


# ---------------------------------------------------------------------------
# Image-conditioned (CoCoOp meta-net) path: forward + grads
# ---------------------------------------------------------------------------


def test_image_conditioned_oracle(torch_model, learner, jax_params, rng):
    """Per-(sample, class) attribution [B, C, P] with a per-sample context
    shift pi(img).  The torch oracle is the reference loop with
    ``ctx + pi[b]`` in place of ``ctx`` — forward AND grads (ctx + meta-net)
    must match."""
    pcfg = dataclasses.replace(PCFG, image_conditioned=True)
    E, D = CFG.embed_dim, CFG.text_width
    h = max(E // 16, 8)
    r = np.random.default_rng(11)
    meta_j = {
        "w1": jnp.asarray(r.standard_normal((E, h)).astype(np.float32) * 0.2),
        "b1": jnp.asarray(r.standard_normal(h).astype(np.float32) * 0.05),
        "w2": jnp.asarray(r.standard_normal((h, D)).astype(np.float32) * 0.2),
        "b2": jnp.asarray(r.standard_normal(D).astype(np.float32) * 0.05),
    }
    meta_t = {
        k: torch.from_numpy(np.asarray(v)).clone().requires_grad_(True)
        for k, v in meta_j.items()
    }
    feats, labels = _batch(rng)
    ctx_t = _torch_ctx_leaves(learner)

    img_t = torch.from_numpy(feats)
    img_n = img_t / img_t.norm(dim=-1, keepdim=True)
    pi = torch.relu(img_n @ meta_t["w1"] + meta_t["b1"]) @ meta_t["w2"] + meta_t["b2"]
    ref_logits, loss, ref_attr = _torch_forward(
        torch_model, ctx_t, img_t, torch.from_numpy(labels), pi=pi,
    )
    loss.backward()
    ref_ctx_g = np.stack([c.grad.numpy() for c in ctx_t])
    ref_meta_g = {k: v.grad.numpy() for k, v in meta_t.items()}

    def jax_loss(ctx, meta):
        t = dict(_jax_trainable(learner, meta_net=meta), ctx=ctx)
        out = full_model_forward(
            jax_params, t, learner.bank, None,
            jnp.asarray(labels.astype(np.int32)),
            clip_cfg=CFG, prompt_cfg=pcfg, with_loss=True,
            image_feats=jnp.asarray(feats),
        )
        return out["loss"], out

    (g_ctx, g_meta) = jax.grad(
        lambda c, m: jax_loss(c, m)[0], argnums=(0, 1)
    )(learner.bank.ctx, meta_j)
    _, out = jax_loss(learner.bank.ctx, meta_j)

    C = len(CLASSES)
    np.testing.assert_allclose(
        np.asarray(out["logits"])[:, :C], ref_logits.detach().numpy(),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["attribution"])[:, :C], ref_attr.numpy(),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(np.asarray(g_ctx)[:C], ref_ctx_g,
                               rtol=2e-4, atol=1e-6)
    for k in ref_meta_g:
        np.testing.assert_allclose(
            np.asarray(g_meta[k]), ref_meta_g[k], rtol=2e-4, atol=1e-6,
            err_msg=f"meta-net grad mismatch: {k}",
        )
