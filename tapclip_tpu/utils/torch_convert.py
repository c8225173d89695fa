"""Weight conversion: open_clip / torch checkpoints -> tapclip_tpu pytrees.

The reference loads a local open_clip ``.bin`` state dict with
``strict=True`` (``/root/reference/models/clip_wrapper.py:13-15``), and its
eval drivers load prompt checkpoints including a **legacy-layout migration**
(old ``prompt_learner.context_emb [n_cls, P, D]`` split into per-class
``context_bank.{name}`` entries, ``test_cross_domain.py:44-61``).  This module
provides the TPU-side equivalents (SURVEY.md §7 hard part 4):

* ``convert_openclip_state_dict``  — open_clip torch layout -> our param tree
  (fused ``in_proj_weight`` split preserved; Linear weights transposed to the
  ``x @ w`` convention; conv patch kernel permuted to (ph, pw, c) order).
* ``load_torch_file``              — ``torch.load`` a ``.pt``/``.bin`` into
  numpy (CPU, no grad machinery).
* ``convert_prompt_state_dict``    — both prompt-checkpoint layouts (legacy
  stacked + per-class bank) -> ``{class_name: ctx}`` + extras.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

from tapclip_tpu.config import CLIPConfig


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint to a flat {key: np.ndarray} dict."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    out = {}
    for k, v in state.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _f32(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _convert_block(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    """One open_clip ResidualAttentionBlock -> our block dict."""
    return {
        "ln_1": {
            "scale": _f32(sd[f"{prefix}.ln_1.weight"]),
            "bias": _f32(sd[f"{prefix}.ln_1.bias"]),
        },
        "attn": {
            # torch packs [q;k;v] along the OUT dim of in_proj_weight
            # [3W, W]; transposed -> columns [q|k|v], matching our
            # jnp.split(qkv, 3, axis=-1).
            "w_qkv": _f32(sd[f"{prefix}.attn.in_proj_weight"]).T,
            "b_qkv": _f32(sd[f"{prefix}.attn.in_proj_bias"]),
            "w_out": _f32(sd[f"{prefix}.attn.out_proj.weight"]).T,
            "b_out": _f32(sd[f"{prefix}.attn.out_proj.bias"]),
        },
        "ln_2": {
            "scale": _f32(sd[f"{prefix}.ln_2.weight"]),
            "bias": _f32(sd[f"{prefix}.ln_2.bias"]),
        },
        "mlp": {
            "w_fc": _f32(sd[f"{prefix}.mlp.c_fc.weight"]).T,
            "b_fc": _f32(sd[f"{prefix}.mlp.c_fc.bias"]),
            "w_proj": _f32(sd[f"{prefix}.mlp.c_proj.weight"]).T,
            "b_proj": _f32(sd[f"{prefix}.mlp.c_proj.bias"]),
        },
    }


def _stack_blocks(blocks) -> Dict[str, Any]:
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *blocks)


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel with a=-0.75 (PyTorch's bicubic)."""
    x = np.abs(x)
    return np.where(
        x <= 1.0,
        (a + 2.0) * x ** 3 - (a + 3.0) * x ** 2 + 1.0,
        np.where(x < 2.0, a * (x ** 3 - 5.0 * x ** 2 + 8.0 * x - 4.0), 0.0),
    )


def _resize_axis_cubic(arr: np.ndarray, out_size: int, axis: int) -> np.ndarray:
    """1-D cubic resample along ``axis`` with half-pixel centers
    (``align_corners=False``) and border-clamped taps — the semantics of
    ``F.interpolate(mode='bicubic', align_corners=False, antialias=False)``
    applied separably."""
    in_size = arr.shape[axis]
    if in_size == out_size:
        return arr
    arr = np.moveaxis(np.asarray(arr, np.float64), axis, 0)
    scale = in_size / out_size
    coords = (np.arange(out_size) + 0.5) * scale - 0.5
    base = np.floor(coords).astype(np.int64)
    acc = np.zeros((out_size,) + arr.shape[1:], np.float64)
    for tap in (-1, 0, 1, 2):
        idx = np.clip(base + tap, 0, in_size - 1)
        w = _cubic_kernel(coords - (base + tap))
        acc += w.reshape((out_size,) + (1,) * (arr.ndim - 1)) * arr[idx]
    return np.moveaxis(acc, 0, axis)


def resize_pos_embed(pos: np.ndarray, target_len: int) -> np.ndarray:
    """open_clip ``resize_pos_embed``: adapt a ``[1 + g*g, W]`` vision
    positional embedding to a new grid (``target_len = 1 + g'*g'``) — the
    class-token row is kept, the grid rows are bicubic-resampled as a
    ``[g, g, W]`` image (torch bicubic a=-0.75, half-pixel centers; pinned
    against ``F.interpolate`` in tests/test_convert_script.py).  Used when
    loading checkpoints at a different resolution than they were trained at
    (e.g. ViT-L/14 224px weights into the ViT-L-14-336 preset)."""
    if pos.shape[0] == target_len:
        return _f32(pos)
    g_in = int(round((pos.shape[0] - 1) ** 0.5))
    g_out = int(round((target_len - 1) ** 0.5))
    if g_in * g_in + 1 != pos.shape[0] or g_out * g_out + 1 != target_len:
        raise ValueError(
            f"cannot resize pos embed {pos.shape[0]} -> {target_len}: "
            "both must be 1 + square-grid"
        )
    cls_row, grid = pos[:1], pos[1:].reshape(g_in, g_in, -1)
    grid = _resize_axis_cubic(grid, g_out, 0)
    grid = _resize_axis_cubic(grid, g_out, 1)
    return np.concatenate(
        [_f32(cls_row), grid.reshape(g_out * g_out, -1).astype(np.float32)]
    )


def _convert_conv(w: np.ndarray) -> Dict[str, np.ndarray]:
    """torch conv [O, I, kh, kw] -> HWIO (NHWC convolution layout)."""
    return {"w": _f32(w).transpose(2, 3, 1, 0)}


def _convert_bn(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _f32(sd[f"{prefix}.weight"]),
        "bias": _f32(sd[f"{prefix}.bias"]),
        "mean": _f32(sd[f"{prefix}.running_mean"]),
        "var": _f32(sd[f"{prefix}.running_var"]),
    }


def _convert_bottleneck(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    p = {
        "conv1": _convert_conv(sd[f"{prefix}.conv1.weight"]),
        "bn1": _convert_bn(sd, f"{prefix}.bn1"),
        "conv2": _convert_conv(sd[f"{prefix}.conv2.weight"]),
        "bn2": _convert_bn(sd, f"{prefix}.bn2"),
        "conv3": _convert_conv(sd[f"{prefix}.conv3.weight"]),
        "bn3": _convert_bn(sd, f"{prefix}.bn3"),
    }
    if f"{prefix}.downsample.0.weight" in sd:
        # CLIP's downsample OrderedDict: ["-1" avgpool, "0" conv, "1" bn].
        p["downsample"] = {
            "conv": _convert_conv(sd[f"{prefix}.downsample.0.weight"]),
            "bn": _convert_bn(sd, f"{prefix}.downsample.1"),
        }
    return p


def _convert_resnet_visual(sd: Dict[str, np.ndarray], cfg: CLIPConfig) -> Dict[str, Any]:
    """open_clip ModifiedResNet ``visual.*`` -> our resnet param tree."""
    v: Dict[str, Any] = {
        "conv1": _convert_conv(sd["visual.conv1.weight"]),
        "bn1": _convert_bn(sd, "visual.bn1"),
        "conv2": _convert_conv(sd["visual.conv2.weight"]),
        "bn2": _convert_bn(sd, "visual.bn2"),
        "conv3": _convert_conv(sd["visual.conv3.weight"]),
        "bn3": _convert_bn(sd, "visual.bn3"),
    }
    for li, n_blocks in enumerate(cfg.resnet_layers):
        v[f"layer{li + 1}"] = [
            _convert_bottleneck(sd, f"visual.layer{li + 1}.{b}")
            for b in range(n_blocks)
        ]
    v["attnpool"] = {
        # attnpool grid = (image_size // 32)^2 + 1; resampled when loading a
        # checkpoint trained at another resolution.
        "positional_embedding": resize_pos_embed(
            _f32(sd["visual.attnpool.positional_embedding"]),
            (cfg.image_size // 32) ** 2 + 1,
        ),
        **{
            f"{n}_proj": {
                "w": _f32(sd[f"visual.attnpool.{n}_proj.weight"]),
                "b": _f32(sd[f"visual.attnpool.{n}_proj.bias"]),
            }
            for n in ("q", "k", "v", "c")
        },
    }
    return v


def convert_openclip_state_dict(
    sd: Dict[str, np.ndarray], cfg: CLIPConfig
) -> Dict[str, Any]:
    """open_clip CLIP state dict -> tapclip_tpu param pytree (numpy leaves)."""
    if cfg.vision_tower == "resnet":
        t_blocks = [
            _convert_block(sd, f"transformer.resblocks.{i}")
            for i in range(cfg.text_layers)
        ]
        return {
            "visual": _convert_resnet_visual(sd, cfg),
            "text": {
                "token_embedding": _f32(sd["token_embedding.weight"]),
                "positional_embedding": _f32(sd["positional_embedding"]),
                "blocks": _stack_blocks(t_blocks),
                "ln_final": {
                    "scale": _f32(sd["ln_final.weight"]),
                    "bias": _f32(sd["ln_final.bias"]),
                },
                "text_projection": _f32(sd["text_projection"]),
            },
            "logit_scale": _f32(sd["logit_scale"]).reshape(()),
        }
    conv_w = _f32(sd["visual.conv1.weight"])  # [O, C, kh, kw]
    O, C, kh, kw = conv_w.shape
    if kh != cfg.patch_size:
        raise ValueError(
            f"checkpoint patch size {kh} != config patch size {cfg.patch_size}"
        )
    patch_w = conv_w.transpose(2, 3, 1, 0).reshape(kh * kw * C, O)

    v_blocks = [
        _convert_block(sd, f"visual.transformer.resblocks.{i}")
        for i in range(cfg.vision_layers)
    ]
    t_blocks = [
        _convert_block(sd, f"transformer.resblocks.{i}")
        for i in range(cfg.text_layers)
    ]

    params = {
        "visual": {
            "patch_embed": {"w": patch_w},
            "class_embedding": _f32(sd["visual.class_embedding"]),
            "positional_embedding": resize_pos_embed(
                _f32(sd["visual.positional_embedding"]), cfg.vision_seq_len
            ),
            "ln_pre": {
                "scale": _f32(sd["visual.ln_pre.weight"]),
                "bias": _f32(sd["visual.ln_pre.bias"]),
            },
            "blocks": _stack_blocks(v_blocks),
            "ln_post": {
                "scale": _f32(sd["visual.ln_post.weight"]),
                "bias": _f32(sd["visual.ln_post.bias"]),
            },
            "proj": _f32(sd["visual.proj"]),
        },
        "text": {
            "token_embedding": _f32(sd["token_embedding.weight"]),
            "positional_embedding": _f32(sd["positional_embedding"]),
            "blocks": _stack_blocks(t_blocks),
            "ln_final": {
                "scale": _f32(sd["ln_final.weight"]),
                "bias": _f32(sd["ln_final.bias"]),
            },
            "text_projection": _f32(sd["text_projection"]),
        },
        "logit_scale": _f32(sd["logit_scale"]).reshape(()),
    }
    return params


def load_openclip_checkpoint(path: str, cfg: CLIPConfig) -> Dict[str, Any]:
    """``torch.load`` + convert, the rebuild of ``clip_wrapper.py:13-15``."""
    sd = load_torch_file(path)
    # open_clip sometimes nests under 'state_dict' and prefixes 'module.'.
    if "state_dict" in sd and not any(k.startswith("visual.") for k in sd):
        sd = sd["state_dict"]
    sd = {re.sub(r"^module\.", "", k): v for k, v in sd.items()}
    return convert_openclip_state_dict(sd, cfg)


# ---------------------------------------------------------------------------
# Prompt checkpoints (reference FullModel state dicts)
# ---------------------------------------------------------------------------


def convert_prompt_state_dict(
    sd: Dict[str, np.ndarray],
    seen_class_names: Sequence[str],
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Reference FullModel state dict -> (ctx_by_name, extras).

    Handles BOTH layouts the reference handles (test_cross_domain.py:44-61):
      * legacy: ``prompt_learner.context_emb`` stacked ``[n_cls, P, D]``,
        split across ``seen_class_names`` in order;
      * current: per-class ``prompt_learner.context_bank.{name}`` entries.

    extras currently carries ``logit_scale`` when present.
    """
    ctx_by_name: Dict[str, np.ndarray] = {}
    if "prompt_learner.context_emb" in sd:
        old_ctx = _f32(sd["prompt_learner.context_emb"])
        if old_ctx.ndim == 2:
            old_ctx = old_ctx[None]
        for i, name in enumerate(seen_class_names):
            if i < old_ctx.shape[0]:
                ctx_by_name[name] = old_ctx[i]
    prefix = "prompt_learner.context_bank."
    for k, v in sd.items():
        if k.startswith(prefix):
            ctx_by_name[k[len(prefix) :]] = _f32(v)

    extras: Dict[str, np.ndarray] = {}
    if "logit_scale" in sd:
        extras["logit_scale"] = _f32(sd["logit_scale"]).reshape(())
    return ctx_by_name, extras


def load_reference_prompt_checkpoint(
    path: str, seen_class_names: Sequence[str]
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    return convert_prompt_state_dict(load_torch_file(path), seen_class_names)


# ---------------------------------------------------------------------------
# Export (JAX -> open_clip): the exact inverse of convert_openclip_state_dict
# ---------------------------------------------------------------------------


def _export_block(blk: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """Our block dict (one layer, unstacked) -> open_clip resblock keys."""
    return {
        f"{prefix}.ln_1.weight": _f32(blk["ln_1"]["scale"]),
        f"{prefix}.ln_1.bias": _f32(blk["ln_1"]["bias"]),
        f"{prefix}.attn.in_proj_weight": _f32(blk["attn"]["w_qkv"]).T,
        f"{prefix}.attn.in_proj_bias": _f32(blk["attn"]["b_qkv"]),
        f"{prefix}.attn.out_proj.weight": _f32(blk["attn"]["w_out"]).T,
        f"{prefix}.attn.out_proj.bias": _f32(blk["attn"]["b_out"]),
        f"{prefix}.ln_2.weight": _f32(blk["ln_2"]["scale"]),
        f"{prefix}.ln_2.bias": _f32(blk["ln_2"]["bias"]),
        f"{prefix}.mlp.c_fc.weight": _f32(blk["mlp"]["w_fc"]).T,
        f"{prefix}.mlp.c_fc.bias": _f32(blk["mlp"]["b_fc"]),
        f"{prefix}.mlp.c_proj.weight": _f32(blk["mlp"]["w_proj"]).T,
        f"{prefix}.mlp.c_proj.bias": _f32(blk["mlp"]["b_proj"]),
    }


def _unstack_blocks(blocks: Dict[str, Any], n: int):
    import jax

    return [jax.tree.map(lambda a: np.asarray(a)[i], blocks) for i in range(n)]


def _export_conv(p: Dict[str, Any]) -> np.ndarray:
    """HWIO -> torch conv [O, I, kh, kw]."""
    return _f32(p["w"]).transpose(3, 2, 0, 1)


def _export_bn(p: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        f"{prefix}.weight": _f32(p["scale"]),
        f"{prefix}.bias": _f32(p["bias"]),
        f"{prefix}.running_mean": _f32(p["mean"]),
        f"{prefix}.running_var": _f32(p["var"]),
    }


def _export_resnet_visual(v: Dict[str, Any], cfg: CLIPConfig) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {
        "visual.conv1.weight": _export_conv(v["conv1"]),
        **_export_bn(v["bn1"], "visual.bn1"),
        "visual.conv2.weight": _export_conv(v["conv2"]),
        **_export_bn(v["bn2"], "visual.bn2"),
        "visual.conv3.weight": _export_conv(v["conv3"]),
        **_export_bn(v["bn3"], "visual.bn3"),
    }
    for li, n_blocks in enumerate(cfg.resnet_layers):
        for b in range(n_blocks):
            blk = v[f"layer{li + 1}"][b]
            prefix = f"visual.layer{li + 1}.{b}"
            sd[f"{prefix}.conv1.weight"] = _export_conv(blk["conv1"])
            sd.update(_export_bn(blk["bn1"], f"{prefix}.bn1"))
            sd[f"{prefix}.conv2.weight"] = _export_conv(blk["conv2"])
            sd.update(_export_bn(blk["bn2"], f"{prefix}.bn2"))
            sd[f"{prefix}.conv3.weight"] = _export_conv(blk["conv3"])
            sd.update(_export_bn(blk["bn3"], f"{prefix}.bn3"))
            if "downsample" in blk:
                sd[f"{prefix}.downsample.0.weight"] = _export_conv(
                    blk["downsample"]["conv"]
                )
                sd.update(
                    _export_bn(blk["downsample"]["bn"], f"{prefix}.downsample.1")
                )
    ap = v["attnpool"]
    sd["visual.attnpool.positional_embedding"] = _f32(ap["positional_embedding"])
    for n in ("q", "k", "v", "c"):
        sd[f"visual.attnpool.{n}_proj.weight"] = _f32(ap[f"{n}_proj"]["w"])
        sd[f"visual.attnpool.{n}_proj.bias"] = _f32(ap[f"{n}_proj"]["b"])
    return sd


def export_openclip_state_dict(
    params: Dict[str, Any], cfg: CLIPConfig
) -> Dict[str, np.ndarray]:
    """tapclip_tpu param pytree -> open_clip CLIP state dict (numpy values).

    The inverse of :func:`convert_openclip_state_dict`, so a pretrained /
    distilled / EMA tree can go back to the torch ecosystem (open_clip
    ``load_state_dict``, the reference's ``clip_wrapper.py:13-15`` loader).
    Training-only extras that have no open_clip slot (``kd_proj``, unmerged
    LoRA adapters) are rejected loudly — merge/strip before exporting.
    ``logit_bias`` (SigLIP trees) is exported when present.
    """
    known = {"visual", "text", "logit_scale", "logit_bias"}
    extras = set(params) - known
    if extras:
        raise ValueError(
            f"param tree has no open_clip slot for {sorted(extras)}: "
            "strip kd_proj (distill.strip_distill_params) / merge LoRA "
            "(peft.merge_lora) before exporting"
        )
    t = params["text"]
    n_text = int(np.asarray(t["blocks"]["ln_1"]["scale"]).shape[0])
    sd: Dict[str, np.ndarray] = {}
    if cfg.vision_tower == "resnet":
        sd.update(_export_resnet_visual(params["visual"], cfg))
    else:
        v = params["visual"]
        patch_w = _f32(v["patch_embed"]["w"])  # [kh*kw*C, O]
        k = cfg.patch_size
        O = patch_w.shape[1]
        sd["visual.conv1.weight"] = (
            patch_w.reshape(k, k, 3, O).transpose(3, 2, 0, 1)
        )
        sd["visual.class_embedding"] = _f32(v["class_embedding"])
        sd["visual.positional_embedding"] = _f32(v["positional_embedding"])
        sd["visual.ln_pre.weight"] = _f32(v["ln_pre"]["scale"])
        sd["visual.ln_pre.bias"] = _f32(v["ln_pre"]["bias"])
        n_vis = int(np.asarray(v["blocks"]["ln_1"]["scale"]).shape[0])
        for i, blk in enumerate(_unstack_blocks(v["blocks"], n_vis)):
            sd.update(_export_block(blk, f"visual.transformer.resblocks.{i}"))
        sd["visual.ln_post.weight"] = _f32(v["ln_post"]["scale"])
        sd["visual.ln_post.bias"] = _f32(v["ln_post"]["bias"])
        sd["visual.proj"] = _f32(v["proj"])
    for i, blk in enumerate(_unstack_blocks(t["blocks"], n_text)):
        sd.update(_export_block(blk, f"transformer.resblocks.{i}"))
    sd["token_embedding.weight"] = _f32(t["token_embedding"])
    sd["positional_embedding"] = _f32(t["positional_embedding"])
    sd["ln_final.weight"] = _f32(t["ln_final"]["scale"])
    sd["ln_final.bias"] = _f32(t["ln_final"]["bias"])
    sd["text_projection"] = _f32(t["text_projection"])
    sd["logit_scale"] = _f32(params["logit_scale"]).reshape(())
    if "logit_bias" in params:
        sd["logit_bias"] = _f32(params["logit_bias"]).reshape(())
    return sd


def save_openclip_checkpoint(
    params: Dict[str, Any], cfg: CLIPConfig, path: str
) -> str:
    """Export + ``torch.save`` as a plain open_clip ``.bin`` state dict."""
    import torch

    sd = export_openclip_state_dict(params, cfg)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, path)
    return path


def export_prompt_state_dict(
    ctx: np.ndarray,
    class_names: Sequence[str],
    *,
    logit_scale: Optional[np.ndarray] = None,
    legacy: bool = False,
) -> Dict[str, np.ndarray]:
    """Trained context vectors -> a reference-format prompt state dict.

    The inverse of :func:`convert_prompt_state_dict`, so prompts tuned here
    can be loaded by the reference's own eval drivers
    (``/root/reference/test_cross_domain.py:44-61``).  ``ctx`` is the
    padded ``[C_max, P, D]`` trainable stack; only the first
    ``len(class_names)`` rows are real.  ``legacy=True`` writes the stacked
    ``prompt_learner.context_emb`` layout instead of the current per-class
    ``prompt_learner.context_bank.{name}`` entries.
    """
    ctx = _f32(ctx)[: len(class_names)]
    if legacy:
        sd: Dict[str, np.ndarray] = {"prompt_learner.context_emb": ctx}
    else:
        sd = {
            f"prompt_learner.context_bank.{name}": ctx[i]
            for i, name in enumerate(class_names)
        }
    if logit_scale is not None:
        sd["logit_scale"] = _f32(logit_scale).reshape(())
    return sd


def save_reference_prompt_checkpoint(
    ctx: np.ndarray,
    class_names: Sequence[str],
    path: str,
    *,
    logit_scale: Optional[np.ndarray] = None,
    legacy: bool = False,
) -> str:
    """Export + ``torch.save`` (a ``.pt`` the reference can ``torch.load``)."""
    import torch

    sd = export_prompt_state_dict(
        ctx, class_names, logit_scale=logit_scale, legacy=legacy
    )
    torch.save(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        path,
    )
    return path
