"""ModifiedResNet image tower (CLIP RN50 family), TPU-native.

The reference's ``CLIPWrapper`` accepts any open_clip ``model_name``
(``/root/reference/models/clip_wrapper.py:10``); it only ever instantiates
ViT-B-32, but the RN50 family is part of that interface.  This reimplements
CLIP's ``ModifiedResNet`` (the architecture open_clip builds for ``RN50``/
``RN101``): a 3-conv stem with an average-pool (no max-pool), Bottleneck
blocks whose stride-2 lives in an avg-pool before ``conv3`` (anti-aliased
downsampling), and a multi-head ``AttentionPool2d`` head with separate
q/k/v/c projections.

TPU-first choices: NHWC layout end to end (``lax.conv_general_dilated`` with
NHWC/HWIO — XLA's preferred TPU conv form), frozen inference-mode BatchNorm
folded into scale/shift (the tower is frozen in every reference workload),
and the attention pool expressed with the shared ``attention_reference``.
The weight converter maps open_clip's ``visual.layer{1-4}.{i}.*`` /
``visual.attnpool.*`` state dict (utils/torch_convert.py).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from tapclip_tpu.config import CLIPConfig

Params = Dict[str, Any]

_BN_EPS = 1e-5


# ---------------------------------------------------------------------------
# Init (random — real weights come from the converter)
# ---------------------------------------------------------------------------


def _init_conv(key, kh, kw, cin, cout) -> Params:
    fan_in = kh * kw * cin
    return {"w": jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * fan_in ** -0.5}


def _init_bn(c) -> Params:
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def _init_bottleneck(key, inplanes: int, planes: int, stride: int) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "conv1": _init_conv(k1, 1, 1, inplanes, planes),
        "bn1": _init_bn(planes),
        "conv2": _init_conv(k2, 3, 3, planes, planes),
        "bn2": _init_bn(planes),
        "conv3": _init_conv(k3, 1, 1, planes, planes * 4),
        "bn3": _init_bn(planes * 4),
    }
    if stride > 1 or inplanes != planes * 4:
        p["downsample"] = {
            "conv": _init_conv(k4, 1, 1, inplanes, planes * 4),
            "bn": _init_bn(planes * 4),
        }
    return p


def init_resnet_params(key: jax.Array, cfg: CLIPConfig) -> Params:
    """Random-init the ModifiedResNet visual tree (cfg.resnet_layers)."""
    width = cfg.vision_width
    layers = cfg.resnet_layers
    keys = jax.random.split(key, 8 + sum(layers))
    ki = iter(range(len(keys)))
    p: Params = {
        "conv1": _init_conv(keys[next(ki)], 3, 3, 3, width // 2),
        "bn1": _init_bn(width // 2),
        "conv2": _init_conv(keys[next(ki)], 3, 3, width // 2, width // 2),
        "bn2": _init_bn(width // 2),
        "conv3": _init_conv(keys[next(ki)], 3, 3, width // 2, width),
        "bn3": _init_bn(width),
    }
    inplanes = width
    for li, (n_blocks, planes, stride) in enumerate(
        zip(layers, (width, width * 2, width * 4, width * 8), (1, 2, 2, 2))
    ):
        blocks = []
        for b in range(n_blocks):
            blocks.append(
                _init_bottleneck(
                    keys[next(ki)], inplanes, planes, stride if b == 0 else 1
                )
            )
            inplanes = planes * 4
        p[f"layer{li + 1}"] = blocks
    embed = width * 32
    kq, kk, kv, kc, kp = jax.random.split(keys[next(ki)], 5)
    p["attnpool"] = {
        "positional_embedding": jax.random.normal(
            kp, ((cfg.image_size // 32) ** 2 + 1, embed), jnp.float32
        )
        * embed ** -0.5,
        "q_proj": {"w": jax.random.normal(kq, (embed, embed), jnp.float32) * embed ** -0.5,
                   "b": jnp.zeros((embed,), jnp.float32)},
        "k_proj": {"w": jax.random.normal(kk, (embed, embed), jnp.float32) * embed ** -0.5,
                   "b": jnp.zeros((embed,), jnp.float32)},
        "v_proj": {"w": jax.random.normal(kv, (embed, embed), jnp.float32) * embed ** -0.5,
                   "b": jnp.zeros((embed,), jnp.float32)},
        # torch Linear layout [out, in]; forward applies x @ w.T.
        "c_proj": {"w": jax.random.normal(kc, (cfg.embed_dim, embed), jnp.float32) * embed ** -0.5,
                   "b": jnp.zeros((cfg.embed_dim,), jnp.float32)},
    }
    return p


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _conv(x: jnp.ndarray, p: Params, stride: int = 1, padding=None) -> jnp.ndarray:
    kh = p["w"].shape[0]
    if padding is None:
        pad = (kh - 1) // 2
        padding = [(pad, pad), (pad, pad)]
    return jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _bn(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    # Frozen inference-mode BatchNorm as a fused scale/shift (f32 stats).
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + _BN_EPS)
    scale = (p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    shift = (
        p["bias"].astype(jnp.float32) - p["mean"].astype(jnp.float32) * p["scale"].astype(jnp.float32) * inv
    ).astype(x.dtype)
    return x * scale + shift


def _avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    # Reshape-mean (window == stride == k, VALID): equivalent to
    # nn.AvgPool2d and, unlike the generic ``lax.reduce_window(add)`` form,
    # differentiable under jit on jax 0.9 ("Linearization failed to produce
    # known values" — hit when pretraining RN towers). Tail rows/cols are
    # cropped exactly like VALID padding.
    B, H, W, C = x.shape
    Hk, Wk = (H // k) * k, (W // k) * k
    x = x[:, :Hk, :Wk, :]
    x = x.reshape(B, Hk // k, k, Wk // k, k, C)
    return x.sum(axis=(2, 4)) / jnp.asarray(k * k, x.dtype)


def _bottleneck(x: jnp.ndarray, p: Params, stride: int) -> jnp.ndarray:
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"]), p["bn2"]))
    if stride > 1:
        out = _avg_pool(out, stride)
    out = _bn(_conv(out, p["conv3"]), p["bn3"])
    if "downsample" in p:
        idn = _avg_pool(x, stride) if stride > 1 else x
        idn = _bn(_conv(idn, p["downsample"]["conv"]), p["downsample"]["bn"])
    else:
        idn = x
    return jax.nn.relu(out + idn)


def _attention_pool(x: jnp.ndarray, p: Params, n_heads: int) -> jnp.ndarray:
    """CLIP AttentionPool2d: mean-token query over HW+1 keys."""
    from tapclip_tpu.ops.attention import attention_reference

    B, H, W, C = x.shape
    t = x.reshape(B, H * W, C)
    t = jnp.concatenate([t.mean(axis=1, keepdims=True), t], axis=1)  # [B, HW+1, C]
    t = t + p["positional_embedding"].astype(t.dtype)[None]

    def proj(v, pr):
        return (
            jnp.dot(v, pr["w"].astype(v.dtype).T, preferred_element_type=jnp.float32)
            + pr["b"].astype(jnp.float32)
        ).astype(v.dtype)

    q = proj(t[:, :1], p["q_proj"])  # [B, 1, C]
    k = proj(t, p["k_proj"])
    v = proj(t, p["v_proj"])
    Dh = C // n_heads

    def heads(a):
        return a.reshape(B, a.shape[1], n_heads, Dh).transpose(0, 2, 1, 3)

    out, _ = attention_reference(heads(q), heads(k), heads(v))
    out = out.transpose(0, 2, 1, 3).reshape(B, 1, C)[:, 0]
    return proj(out, p["c_proj"])


def resnet_feature_map(params: Params, cfg: CLIPConfig, images: jnp.ndarray) -> jnp.ndarray:
    """Backbone only: images [B, H, W, 3] -> pre-attnpool map [B, h, w, C]
    (h = w = image_size // 32). Split out so explainability can read the
    attnpool attention (utils/saliency.py) over exactly this map."""
    p = params["visual"]
    x = images.astype(cfg.compute_dtype)
    # Stem: three 3x3 convs (first stride-2) + avgpool-2.
    x = jax.nn.relu(_bn(_conv(x, p["conv1"], stride=2), p["bn1"]))
    x = jax.nn.relu(_bn(_conv(x, p["conv2"]), p["bn2"]))
    x = jax.nn.relu(_bn(_conv(x, p["conv3"]), p["bn3"]))
    x = _avg_pool(x, 2)
    for li in range(4):
        blocks = p[f"layer{li + 1}"]
        stride = 1 if li == 0 else 2
        for b, bp in enumerate(blocks):
            x = _bottleneck(x, bp, stride if b == 0 else 1)
    return x


def resnet_encode_image(params: Params, cfg: CLIPConfig, images: jnp.ndarray) -> jnp.ndarray:
    """Images [B, H, W, 3] (preprocessed) -> features [B, embed_dim]."""
    x = resnet_feature_map(params, cfg, images)
    n_heads = cfg.vision_width * 32 // 64
    return _attention_pool(x, params["visual"]["attnpool"], n_heads)
