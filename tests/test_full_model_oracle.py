"""FULL FullModel forward vs a torch reimplementation of the reference loop.

Round 1 oracle-pinned the towers and the attention/attribution kernel
(tests/test_clip_model.py); this pins the ENTIRE pipeline — prompt bank init,
per-class/per-sample attribution loop (reference model_wrapper.py:47-65),
scale adjustor, second text pass, T-1 pooling, projection, normalization,
logit scale, and cross-entropy — against an independent torch implementation
of `/root/reference/models/model_wrapper.py:28-100` using the *intended*
attention-capture semantics (need_weights=True head-averaged probabilities;
the reference's hook comment documents this, see SURVEY.md §2.1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tapclip_tpu.config import CLIPConfig, PromptConfig
from tapclip_tpu.data.tokenizer import get_tokenizer
from tapclip_tpu.models.model_wrapper import FullModel
from tapclip_tpu.utils.torch_convert import convert_openclip_state_dict

from tests.test_clip_model import TorchCLIP

TOKENIZER = get_tokenizer(context_length=16)

CFG = CLIPConfig(
    name="oracle-test",
    image_size=32,
    patch_size=8,
    vision_width=32,
    vision_layers=2,
    vision_heads=4,
    vocab_size=TOKENIZER.vocab_size,  # fallback byte-level vocab (514)
    context_length=16,
    text_width=16,
    text_layers=2,
    text_heads=2,
    embed_dim=24,
)
PCFG = PromptConfig(prompt_len=3, max_classes=8, adjustor_method="scale")
CLASSES = ["Backpack", "Pen", "Mug"]


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(7)
    return TorchCLIP(CFG).eval()


@pytest.fixture(scope="module")
def jax_params(torch_model):
    return jax.tree.map(
        jnp.asarray, convert_openclip_state_dict(torch_model.openclip_state_dict(), CFG)
    )


def _torch_reference_forward(torch_model, images, labels):
    """The reference FullModel.forward, loop-for-loop (model_wrapper.py:28-100)."""
    P = PCFG.prompt_len
    tok_emb_w = torch_model.token_embedding.weight
    blocks = torch_model.transformer.resblocks

    def last_block_attn_probs(x):
        # Run all blocks; capture the LAST block's head-averaged attention
        # probabilities (what the reference's hook intends to capture from
        # resblocks[-1].attn, clip_wrapper.py:29-40).
        for blk in blocks[:-1]:
            x = blk(x)
        y = blocks[-1].ln_1(x)
        _, w = blocks[-1].attn(y, y, y, need_weights=True, average_attn_weights=True)
        return w  # [N, T, T]

    def raw_transformer(x):
        for blk in blocks:
            x = blk(x)
        return x

    B = images.shape[0]
    img = torch_model.encode_image(images)
    img = img / img.norm(dim=-1, keepdim=True)  # model_wrapper.py:40-41

    logits = []
    attributions = []
    for name in CLASSES:
        ids = torch.from_numpy(
            TOKENIZER.tokenize([PCFG.template.format(name)], CFG.context_length)
        ).long()[0]
        tok = tok_emb_w[ids]  # [77(=16), D] frozen template embedding
        ctx = tok[5 : 5 + P]  # prompt_learner.py:37-39 init (untrained here)

        full = torch.cat(
            [ctx[None].expand(B, -1, -1), tok[None].expand(B, -1, -1)], dim=1
        )  # [B, P+16, D]
        T = full.shape[1]

        # HOT LOOP 2: per-sample attribution (model_wrapper.py:55-65).
        attrs = []
        for b in range(B):
            w = last_block_attn_probs(full[b : b + 1])
            col = w[0, :P, T - 1]  # attribution_monitor.py:26-29
            attrs.append(F.softmax(col, dim=-1))
        attribution = torch.stack(attrs)  # [B, P]

        # 'scale' adjustor (prompt_adjustor.py:35-36).
        adjusted = ctx[None].expand(B, -1, -1) * attribution[:, :, None]
        full2 = torch.cat([adjusted, tok[None].expand(B, -1, -1)], dim=1)
        x2 = raw_transformer(full2)
        feat = x2[:, -1] @ torch_model.text_projection  # pool at T-1, no ln_final
        feat = feat / feat.norm(dim=-1, keepdim=True)
        sim = np.exp(np.log(1 / 0.07)) * (img * feat).sum(dim=-1)
        logits.append(sim)
        attributions.append(attribution[0])  # image-independent: row 0

    logits = torch.stack(logits, dim=1)  # [B, n_cls]
    loss = F.cross_entropy(logits, labels)
    return (
        logits.detach().numpy(),
        torch.stack(attributions).detach().numpy(),
        float(loss.detach()),
    )


def test_full_model_forward_oracle(torch_model, jax_params, rng):
    B = 4
    images = rng.standard_normal((B, CFG.image_size, CFG.image_size, 3)).astype(
        np.float32
    )
    labels = rng.integers(0, len(CLASSES), B).astype(np.int64)

    model = FullModel(
        CLASSES, jax_params, CFG, prompt_cfg=PCFG, tokenizer=TOKENIZER
    )
    out = model(jnp.asarray(images), jnp.asarray(labels.astype(np.int32)))

    ref_logits, ref_attr, ref_loss = _torch_reference_forward(
        torch_model,
        torch.from_numpy(images.transpose(0, 3, 1, 2)),
        torch.from_numpy(labels),
    )

    np.testing.assert_allclose(
        np.asarray(out["logits"]), ref_logits, rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["attribution"]), ref_attr, rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(float(out["loss"]), ref_loss, rtol=2e-4, atol=2e-4)


def test_full_model_oracle_after_unseen_class(torch_model, jax_params, rng):
    """Seen->unseen expansion keeps oracle parity (test_cross_domain.py:65-67)."""
    B = 3
    images = rng.standard_normal((B, CFG.image_size, CFG.image_size, 3)).astype(
        np.float32
    )
    model = FullModel(
        CLASSES[:2], jax_params, CFG, prompt_cfg=PCFG, tokenizer=TOKENIZER
    )
    model.add_class_prompt(CLASSES[2])
    out = model(jnp.asarray(images))

    labels = np.zeros(B, dtype=np.int64)
    ref_logits, _, _ = _torch_reference_forward(
        torch_model,
        torch.from_numpy(images.transpose(0, 3, 1, 2)),
        torch.from_numpy(labels),
    )
    np.testing.assert_allclose(
        np.asarray(out["logits"]), ref_logits, rtol=2e-4, atol=2e-4
    )
