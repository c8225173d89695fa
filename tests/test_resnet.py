"""ModifiedResNet (RN50-family) tower: torch-oracle parity + integration.

The torch oracle reimplements CLIP's ModifiedResNet exactly as open_clip
builds it for ``RN50`` (3-conv stem + avgpool, Bottleneck with avgpool
downsampling, AttentionPool2d via ``F.multi_head_attention_forward`` with
separate projections) and emits the open_clip ``visual.*`` state-dict layout
— pinning both the converter and our NHWC forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from tapclip_tpu.config import CLIPConfig
from tapclip_tpu.models import clip as C
from tapclip_tpu.models.resnet import init_resnet_params, resnet_encode_image
from tapclip_tpu.utils.torch_convert import convert_openclip_state_dict

RCFG = CLIPConfig(
    name="rn-test",
    vision_tower="resnet",
    image_size=64,
    vision_width=16,
    resnet_layers=(1, 1, 1, 1),
    vocab_size=100,
    context_length=12,
    text_width=16,
    text_layers=2,
    text_heads=2,
    embed_dim=24,
)


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        self.stride = stride
        if stride > 1 or inplanes != planes * 4:
            self.downsample = nn.Sequential(
                nn.AvgPool2d(stride) if stride > 1 else nn.Identity(),
                nn.Conv2d(inplanes, planes * 4, 1, bias=False),
                nn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        identity = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(out + identity)


class TorchModifiedResNet(nn.Module):
    def __init__(self, cfg: CLIPConfig):
        super().__init__()
        width = cfg.vision_width
        self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(width // 2)
        self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width // 2)
        self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(width)
        self.avgpool = nn.AvgPool2d(2)
        self._inplanes = width
        self.layer1 = self._make_layer(width, cfg.resnet_layers[0])
        self.layer2 = self._make_layer(width * 2, cfg.resnet_layers[1], stride=2)
        self.layer3 = self._make_layer(width * 4, cfg.resnet_layers[2], stride=2)
        self.layer4 = self._make_layer(width * 8, cfg.resnet_layers[3], stride=2)
        embed_dim = width * 32
        self.num_heads = embed_dim // 64 or 1
        spacial = cfg.image_size // 32
        self.positional_embedding = nn.Parameter(
            torch.randn(spacial ** 2 + 1, embed_dim) / embed_dim ** 0.5
        )
        self.q_proj = nn.Linear(embed_dim, embed_dim)
        self.k_proj = nn.Linear(embed_dim, embed_dim)
        self.v_proj = nn.Linear(embed_dim, embed_dim)
        self.c_proj = nn.Linear(embed_dim, cfg.embed_dim)

    def _make_layer(self, planes, blocks, stride=1):
        layers = [TorchBottleneck(self._inplanes, planes, stride)]
        self._inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(TorchBottleneck(self._inplanes, planes))
        return nn.Sequential(*layers)

    @torch.no_grad()
    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        # AttentionPool2d (CLIP model.py semantics)
        x = x.flatten(start_dim=2).permute(2, 0, 1)  # NCHW -> (HW)NC
        x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
        x = x + self.positional_embedding[:, None, :]
        out, _ = F.multi_head_attention_forward(
            query=x[:1], key=x, value=x,
            embed_dim_to_check=x.shape[-1], num_heads=self.num_heads,
            q_proj_weight=self.q_proj.weight,
            k_proj_weight=self.k_proj.weight,
            v_proj_weight=self.v_proj.weight,
            in_proj_weight=None,
            in_proj_bias=torch.cat(
                [self.q_proj.bias, self.k_proj.bias, self.v_proj.bias]
            ),
            bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
            out_proj_weight=self.c_proj.weight, out_proj_bias=self.c_proj.bias,
            use_separate_proj_weight=True, training=False, need_weights=False,
        )
        return out.squeeze(0)

    def openclip_state_dict(self):
        sd = {}

        def add_bn(prefix, bn):
            sd[f"{prefix}.weight"] = bn.weight
            sd[f"{prefix}.bias"] = bn.bias
            sd[f"{prefix}.running_mean"] = bn.running_mean
            sd[f"{prefix}.running_var"] = bn.running_var

        for i in (1, 2, 3):
            sd[f"visual.conv{i}.weight"] = getattr(self, f"conv{i}").weight
            add_bn(f"visual.bn{i}", getattr(self, f"bn{i}"))
        for li in (1, 2, 3, 4):
            for b, blk in enumerate(getattr(self, f"layer{li}")):
                pre = f"visual.layer{li}.{b}"
                for i in (1, 2, 3):
                    sd[f"{pre}.conv{i}.weight"] = getattr(blk, f"conv{i}").weight
                    add_bn(f"{pre}.bn{i}", getattr(blk, f"bn{i}"))
                if blk.downsample is not None:
                    # open_clip key layout: downsample.0 = conv, .1 = bn
                    sd[f"{pre}.downsample.0.weight"] = blk.downsample[1].weight
                    add_bn(f"{pre}.downsample.1", blk.downsample[2])
        sd["visual.attnpool.positional_embedding"] = self.positional_embedding
        for n in ("q", "k", "v", "c"):
            lin = getattr(self, f"{n}_proj")
            sd[f"visual.attnpool.{n}_proj.weight"] = lin.weight
            sd[f"visual.attnpool.{n}_proj.bias"] = lin.bias
        return {k: v.detach().numpy() for k, v in sd.items()}


@pytest.fixture(scope="module")
def torch_rn():
    torch.manual_seed(11)
    m = TorchModifiedResNet(RCFG).eval()
    # Non-trivial BN running stats (fresh BNs have mean 0 / var 1).
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.6, 1.4)
    return m


@pytest.fixture(scope="module")
def rn_params(torch_rn):
    from tests.test_clip_model import TorchCLIP

    torch.manual_seed(12)
    text_side = TorchCLIP(
        RCFG.replace(vision_tower="vit", patch_size=8, vision_width=32, vision_layers=1,
                     vision_heads=4, image_size=32)
    ).eval()
    sd = dict(text_side.openclip_state_dict())
    sd = {k: v for k, v in sd.items() if not k.startswith("visual.")}
    sd.update(torch_rn.openclip_state_dict())
    return jax.tree.map(jnp.asarray, convert_openclip_state_dict(sd, RCFG))


def test_resnet_encode_image_parity(torch_rn, rn_params, rng):
    imgs = rng.standard_normal((3, RCFG.image_size, RCFG.image_size, 3)).astype(
        np.float32
    )
    ours = np.asarray(C.encode_image(rn_params, RCFG, jnp.asarray(imgs)))
    theirs = torch_rn(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_rn50_preset_full_model_smoke(rng):
    """RN-tower FullModel end to end (random weights, tiny geometry)."""
    from tapclip_tpu.config import PromptConfig
    from tapclip_tpu.data.tokenizer import get_tokenizer

    tok = get_tokenizer(context_length=RCFG.context_length)
    cfg = RCFG.replace(vocab_size=tok.vocab_size)
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    from tapclip_tpu.models.model_wrapper import FullModel

    model = FullModel(
        ["Backpack", "Pen"], params, cfg,
        prompt_cfg=PromptConfig(prompt_len=3, max_classes=4), tokenizer=tok,
    )
    imgs = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    out = model(imgs, jnp.asarray([0, 1], jnp.int32))
    assert out["logits"].shape == (2, 2)
    assert np.isfinite(float(out["loss"]))


def test_rn50_preset_registered():
    from tapclip_tpu.config import MODEL_PRESETS

    rn = MODEL_PRESETS["RN50"]
    assert rn.vision_tower == "resnet" and rn.resnet_layers == (3, 4, 6, 3)
    assert rn.embed_dim == 1024


def test_resnet_random_init_forward(rng):
    params = {"visual": init_resnet_params(jax.random.PRNGKey(0), RCFG)}
    imgs = jnp.asarray(
        rng.standard_normal((2, RCFG.image_size, RCFG.image_size, 3)), jnp.float32
    )
    feats = resnet_encode_image(params, RCFG, imgs)
    assert feats.shape == (2, RCFG.embed_dim)
    assert bool(jnp.isfinite(feats).all())


def test_rn50_scaled_presets(rng):
    """RN50x4 / RN50x16 geometry (open_clip scaled variants) — the tower
    builds and produces finite [B, embed_dim] features at a downscaled
    input resolution (full 288/384 px is CPU-heavy; geometry is identical)."""
    from tapclip_tpu.config import MODEL_PRESETS

    for name, stages, width, embed in [
        ("RN50x4", (4, 6, 10, 6), 80, 640),
        ("RN50x16", (6, 8, 18, 8), 96, 768),
        ("RN50x64", (3, 15, 36, 10), 128, 1024),
    ]:
        cfg = MODEL_PRESETS[name]
        assert cfg.vision_tower == "resnet"
        assert cfg.resnet_layers == stages
        assert cfg.vision_width == width
        assert cfg.embed_dim == embed
        assert cfg.text_width == embed  # open_clip ties these for RN50xN

    small = MODEL_PRESETS["RN50x4"].replace(image_size=96)
    params = {"visual": init_resnet_params(jax.random.PRNGKey(0), small)}
    imgs = jnp.asarray(rng.standard_normal((2, 96, 96, 3)), jnp.float32)
    feats = resnet_encode_image(params, small, imgs)
    assert feats.shape == (2, small.embed_dim)
    assert bool(jnp.isfinite(feats).all())
