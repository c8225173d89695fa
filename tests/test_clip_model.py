"""CLIP model tests: shapes + numeric parity vs a torch oracle.

The torch oracle below reimplements open_clip's ViT/text forward semantics
(``VisionTransformer``/``TextTransformer`` with ``nn.MultiheadAttention``)
and emits a state dict in the open_clip key layout — exercising both the
weight converter (SURVEY.md §7 hard part 4: fused ``in_proj_weight`` etc.)
and our tower numerics end to end on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from tapclip_tpu.config import CLIPConfig
from tapclip_tpu.models import clip as C
from tapclip_tpu.utils.torch_convert import convert_openclip_state_dict

CFG = CLIPConfig(
    name="parity-test",
    image_size=32,
    patch_size=8,
    vision_width=32,
    vision_layers=2,
    vision_heads=4,
    vocab_size=100,
    context_length=12,
    text_width=16,
    text_layers=2,
    text_heads=2,
    embed_dim=24,
)


class TorchBlock(nn.Module):
    """open_clip ResidualAttentionBlock (pre-LN, batch_first)."""

    def __init__(self, width, heads):
        super().__init__()
        self.ln_1 = nn.LayerNorm(width)
        self.attn = nn.MultiheadAttention(width, heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(width)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(width, 4 * width))
        self.mlp.add_module("gelu", nn.GELU())
        self.mlp.add_module("c_proj", nn.Linear(4 * width, width))

    def forward(self, x, attn_mask=None):
        y = self.ln_1(x)
        a, _ = self.attn(y, y, y, need_weights=False, attn_mask=attn_mask)
        x = x + a
        x = x + self.mlp(self.ln_2(x))
        return x


class TorchCLIP(nn.Module):
    def __init__(self, cfg: CLIPConfig):
        super().__init__()
        self.cfg = cfg
        vw, tw = cfg.vision_width, cfg.text_width
        scale = vw ** -0.5

        class Visual(nn.Module):
            pass

        self.visual = Visual()
        self.visual.conv1 = nn.Conv2d(3, vw, cfg.patch_size, cfg.patch_size, bias=False)
        self.visual.class_embedding = nn.Parameter(scale * torch.randn(vw))
        self.visual.positional_embedding = nn.Parameter(
            scale * torch.randn(cfg.vision_seq_len, vw)
        )
        self.visual.ln_pre = nn.LayerNorm(vw)
        self.visual.transformer = nn.Module()
        self.visual.transformer.resblocks = nn.ModuleList(
            [TorchBlock(vw, cfg.vision_heads) for _ in range(cfg.vision_layers)]
        )
        self.visual.ln_post = nn.LayerNorm(vw)
        self.visual.proj = nn.Parameter(scale * torch.randn(vw, cfg.embed_dim))
        # register visual as submodule properly
        self.add_module("visual_mod", self.visual.conv1)

        self.token_embedding = nn.Embedding(cfg.vocab_size, tw)
        self.positional_embedding = nn.Parameter(0.01 * torch.randn(cfg.context_length, tw))
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            [TorchBlock(tw, cfg.text_heads) for _ in range(cfg.text_layers)]
        )
        self.ln_final = nn.LayerNorm(tw)
        self.text_projection = nn.Parameter((tw ** -0.5) * torch.randn(tw, cfg.embed_dim))
        self.logit_scale = nn.Parameter(torch.tensor(np.log(1 / 0.07), dtype=torch.float32))

    @torch.no_grad()
    def encode_image(self, images):  # [B, 3, H, W]
        v = self.visual
        x = v.conv1(images)  # [B, W, g, g]
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)  # [B, N, W]
        cls = v.class_embedding[None, None].expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + v.positional_embedding[None]
        x = v.ln_pre(x)
        for blk in v.transformer.resblocks:
            x = blk(x)
        x = v.ln_post(x)
        return x[:, 0] @ v.proj

    @torch.no_grad()
    def encode_text(self, ids):  # [B, T]
        x = self.token_embedding(ids) + self.positional_embedding[None]
        T = ids.shape[1]
        mask = torch.full((T, T), float("-inf")).triu(1)
        for blk in self.transformer.resblocks:
            x = blk(x, attn_mask=mask)
        x = self.ln_final(x)
        pooled = x[torch.arange(x.shape[0]), ids.argmax(dim=-1)]
        return pooled @ self.text_projection

    @torch.no_grad()
    def raw_transformer(self, embeds):
        """The reference's bare-transformer call (model_wrapper.py:58,72)."""
        x = embeds
        for blk in self.transformer.resblocks:
            x = blk(x)
        return x

    def openclip_state_dict(self):
        sd = {}
        v = self.visual
        sd["visual.conv1.weight"] = v.conv1.weight
        sd["visual.class_embedding"] = v.class_embedding
        sd["visual.positional_embedding"] = v.positional_embedding
        sd["visual.ln_pre.weight"] = v.ln_pre.weight
        sd["visual.ln_pre.bias"] = v.ln_pre.bias
        sd["visual.ln_post.weight"] = v.ln_post.weight
        sd["visual.ln_post.bias"] = v.ln_post.bias
        sd["visual.proj"] = v.proj
        for i, blk in enumerate(v.transformer.resblocks):
            sd.update(_block_sd(blk, f"visual.transformer.resblocks.{i}"))
        sd["token_embedding.weight"] = self.token_embedding.weight
        sd["positional_embedding"] = self.positional_embedding
        sd["ln_final.weight"] = self.ln_final.weight
        sd["ln_final.bias"] = self.ln_final.bias
        sd["text_projection"] = self.text_projection
        sd["logit_scale"] = self.logit_scale
        for i, blk in enumerate(self.transformer.resblocks):
            sd.update(_block_sd(blk, f"transformer.resblocks.{i}"))
        return {k: v.detach().numpy() for k, v in sd.items()}


def _block_sd(blk, prefix):
    return {
        f"{prefix}.ln_1.weight": blk.ln_1.weight,
        f"{prefix}.ln_1.bias": blk.ln_1.bias,
        f"{prefix}.attn.in_proj_weight": blk.attn.in_proj_weight,
        f"{prefix}.attn.in_proj_bias": blk.attn.in_proj_bias,
        f"{prefix}.attn.out_proj.weight": blk.attn.out_proj.weight,
        f"{prefix}.attn.out_proj.bias": blk.attn.out_proj.bias,
        f"{prefix}.ln_2.weight": blk.ln_2.weight,
        f"{prefix}.ln_2.bias": blk.ln_2.bias,
        f"{prefix}.mlp.c_fc.weight": blk.mlp.c_fc.weight,
        f"{prefix}.mlp.c_fc.bias": blk.mlp.c_fc.bias,
        f"{prefix}.mlp.c_proj.weight": blk.mlp.c_proj.weight,
        f"{prefix}.mlp.c_proj.bias": blk.mlp.c_proj.bias,
    }


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    return TorchCLIP(CFG).eval()


@pytest.fixture(scope="module")
def jax_params(torch_model):
    return jax.tree.map(jnp.asarray, convert_openclip_state_dict(torch_model.openclip_state_dict(), CFG))


def test_encode_image_parity(torch_model, jax_params, rng):
    imgs = rng.standard_normal((3, CFG.image_size, CFG.image_size, 3)).astype(np.float32)
    ours = np.asarray(C.encode_image(jax_params, CFG, jnp.asarray(imgs)))
    theirs = torch_model.encode_image(
        torch.from_numpy(imgs.transpose(0, 3, 1, 2))
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_encode_text_parity(torch_model, jax_params, rng):
    ids = rng.integers(1, CFG.vocab_size - 1, size=(4, CFG.context_length))
    ids[:, 0] = CFG.vocab_size - 2
    ids[:, -2] = CFG.vocab_size - 1  # "EOT" = max id at position T-2
    ids = ids.astype(np.int64)
    ours = np.asarray(C.encode_text(jax_params, CFG, jnp.asarray(ids.astype(np.int32))))
    theirs = torch_model.encode_text(torch.from_numpy(ids)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_raw_text_transformer_parity(torch_model, jax_params, rng):
    """ref_compat path: bare transformer, no pos emb / mask / ln_final."""
    embeds = rng.standard_normal((2, 9, CFG.text_width)).astype(np.float32)
    feats, _ = C.text_forward_embeds(
        jax_params, CFG, jnp.asarray(embeds), mode="ref_compat", pool_idx=8
    )
    x = torch_model.raw_transformer(torch.from_numpy(embeds))
    theirs = (x[:, -1] @ torch_model.text_projection).detach().numpy()
    np.testing.assert_allclose(np.asarray(feats), theirs, rtol=1e-4, atol=1e-4)


def test_patchify_matches_conv(torch_model, jax_params, rng):
    imgs = rng.standard_normal((2, CFG.image_size, CFG.image_size, 3)).astype(np.float32)
    patches = C.patchify(jnp.asarray(imgs), CFG.patch_size)
    ours = np.asarray(patches @ jax_params["visual"]["patch_embed"]["w"])
    conv = torch_model.visual.conv1(torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
    theirs = conv.reshape(2, CFG.vision_width, -1).permute(0, 2, 1).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_attribution_aux_matches_torch_attn_weights(torch_model, jax_params, rng):
    """The kernel's aux == torch's need_weights=True head-averaged column.

    This is the *intended* semantics of the reference hook (its comment at
    clip_wrapper.py:34 says attention weights [B,H,T,T]); see SURVEY.md §2.1.
    """
    embeds = rng.standard_normal((2, 9, CFG.text_width)).astype(np.float32)
    _, aux = C.text_forward_embeds(
        jax_params, CFG, jnp.asarray(embeds), mode="ref_compat", attn_to_idx=8
    )
    # torch: run blocks manually, grab last block's averaged attn weights.
    x = torch.from_numpy(embeds)
    blocks = torch_model.transformer.resblocks
    for blk in blocks[:-1]:
        x = blk(x)
    y = blocks[-1].ln_1(x)
    _, w = blocks[-1].attn(y, y, y, need_weights=True, average_attn_weights=True)
    theirs = w[:, :, 8].detach().numpy()  # [B, T] column to last position
    np.testing.assert_allclose(np.asarray(aux), theirs, rtol=1e-4, atol=1e-5)


def test_vit_l_336_preset(rng):
    """ViT-L/14@336px (the high-res fine-tune OpenAI ships): same towers as
    ViT-L/14, 336px input -> 577 vision tokens.  Forward smoke runs at the
    real resolution with a depth-2 tower (24 layers is CPU-prohibitive;
    layer geometry is resolution-independent)."""
    from tapclip_tpu.config import MODEL_PRESETS
    from tapclip_tpu.models import clip as C

    cfg = MODEL_PRESETS["ViT-L-14-336"]
    assert cfg.image_size == 336 and cfg.patch_size == 14
    assert cfg.vision_seq_len == 24 * 24 + 1 == 577
    assert (cfg.vision_width, cfg.vision_layers, cfg.embed_dim) == (1024, 24, 768)

    small = cfg.replace(vision_layers=2, text_layers=2)
    params = C.init_clip_params(jax.random.PRNGKey(0), small)
    imgs = jnp.asarray(rng.standard_normal((1, 336, 336, 3)), jnp.float32)
    feats = C.encode_image(params, small, imgs)
    assert feats.shape == (1, small.embed_dim)
    assert bool(jnp.isfinite(feats).all())
