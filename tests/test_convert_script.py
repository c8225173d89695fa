"""scripts/convert_checkpoint.py round-trips (VERDICT round-1 item 5a).

Feeds the torch oracle's open_clip-layout state dict through the ACTUAL
conversion script (torch .bin -> Orbax), restores it, and checks forward
parity — the mechanical steps of docs/REPRODUCE.md, minus the real weights.
Same for the prompt subcommand with the reference's legacy
``prompt_learner.context_emb`` layout (test_cross_domain.py:44-61).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import convert_checkpoint

from tapclip_tpu import config as config_mod
from tapclip_tpu.models import clip as C
from tests.test_clip_model import CFG, TorchCLIP


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(3)
    return TorchCLIP(CFG).eval()


@pytest.fixture(autouse=True)
def _register_preset(monkeypatch):
    monkeypatch.setitem(config_mod.MODEL_PRESETS, "parity-test", CFG)
    # The prompt subcommand embeds tokenizer ids — needs the fallback
    # byte-level vocab (514) to fit the embedding table.
    monkeypatch.setitem(
        config_mod.MODEL_PRESETS, "parity-test-vocab", CFG.replace(vocab_size=520)
    )


def test_clip_convert_script_roundtrip(torch_model, tmp_path, rng):
    src = tmp_path / "open_clip_pytorch_model.bin"
    torch.save(
        {k: torch.from_numpy(np.asarray(v)) for k, v in torch_model.openclip_state_dict().items()},
        src,
    )
    dst = tmp_path / "converted"
    convert_checkpoint.main(
        ["clip", "--src", str(src), "--model", "parity-test", "--dst", str(dst)]
    )

    import orbax.checkpoint as ocp

    params = ocp.PyTreeCheckpointer().restore(str(dst))
    params = jax.tree.map(jnp.asarray, params)

    imgs = rng.standard_normal((2, CFG.image_size, CFG.image_size, 3)).astype(np.float32)
    ours = np.asarray(C.encode_image(params, CFG, jnp.asarray(imgs)))
    theirs = torch_model.encode_image(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    ids = rng.integers(1, CFG.vocab_size - 1, size=(2, CFG.context_length))
    ids[:, -2] = CFG.vocab_size - 1
    ours = np.asarray(C.encode_text(params, CFG, jnp.asarray(ids.astype(np.int32))))
    theirs = torch_model.encode_text(torch.from_numpy(ids.astype(np.int64))).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_prompt_convert_script_legacy_layout(tmp_path, rng):
    classes = ["Backpack", "Pen"]
    P, D = 5, CFG.text_width
    legacy_ctx = rng.standard_normal((2, P, D)).astype(np.float32)
    src = tmp_path / "best_model_epoch27_acc99.71.pt"
    torch.save(
        {
            "prompt_learner.context_emb": torch.from_numpy(legacy_ctx),
            "logit_scale": torch.tensor(2.0),
        },
        src,
    )
    dst = tmp_path / "prompt_converted"
    convert_checkpoint.main(
        [
            "prompt", "--src", str(src), "--classes", *classes,
            "--model", "parity-test-vocab", "--prompt-len", str(P), "--dst", str(dst),
        ]
    )

    from tapclip_tpu.utils.checkpoint import load_any_prompt_checkpoint

    tree = load_any_prompt_checkpoint(str(dst), classes)
    for i, name in enumerate(classes):
        np.testing.assert_allclose(
            np.asarray(tree["ctx_by_name"][name]), legacy_ctx[i], rtol=1e-6, atol=1e-6
        )


def test_resize_pos_embed_matches_torch_bicubic(rng):
    """The grid resample is pinned against PyTorch's own bicubic
    (a=-0.75, align_corners=False, no antialias) — the exact op open_clip's
    resize_pos_embed applies when loading weights at a new resolution."""
    import torch.nn.functional as F

    from tapclip_tpu.utils.torch_convert import resize_pos_embed

    W = 12
    for g_in, g_out in [(7, 9), (14, 24), (9, 5)]:
        pos = rng.standard_normal((1 + g_in * g_in, W)).astype(np.float32)
        got = resize_pos_embed(pos, 1 + g_out * g_out)
        assert got.shape == (1 + g_out * g_out, W)
        np.testing.assert_array_equal(got[0], pos[0])  # cls row untouched
        ref = F.interpolate(
            torch.from_numpy(pos[1:].reshape(g_in, g_in, W).transpose(2, 0, 1)[None]).double(),
            size=(g_out, g_out), mode="bicubic", align_corners=False,
        )[0].numpy().transpose(1, 2, 0).reshape(g_out * g_out, W)
        np.testing.assert_allclose(got[1:], ref, rtol=1e-5, atol=1e-5)
    # same size: exact passthrough
    pos = rng.standard_normal((50, W)).astype(np.float32)
    np.testing.assert_array_equal(resize_pos_embed(pos, 50), pos)
    with pytest.raises(ValueError, match="square-grid"):
        resize_pos_embed(pos, 48)


def test_convert_at_higher_resolution(torch_model, rng):
    """224-style weights load into a larger-resolution config: the vision
    pos-emb is resampled to the new grid and the tower runs."""
    from tapclip_tpu.utils.torch_convert import convert_openclip_state_dict

    big = CFG.replace(image_size=CFG.image_size * 2)  # grid g -> 2g
    params = jax.tree.map(
        jnp.asarray,
        convert_openclip_state_dict(torch_model.openclip_state_dict(), big),
    )
    assert params["visual"]["positional_embedding"].shape[0] == big.vision_seq_len
    imgs = jnp.asarray(
        rng.standard_normal((2, big.image_size, big.image_size, 3)), jnp.float32
    )
    feats = C.encode_image(params, big, imgs)
    assert feats.shape == (2, big.embed_dim)
    assert bool(jnp.isfinite(feats).all())


# ---------------------------------------------------------------------------
# Export direction (JAX -> open_clip .bin)
# ---------------------------------------------------------------------------


def test_export_inverts_convert(torch_model):
    """import(sd) -> export == identity on the torch side (every key)."""
    from tapclip_tpu.utils.torch_convert import (
        convert_openclip_state_dict,
        export_openclip_state_dict,
    )

    sd = {k: np.asarray(v) for k, v in torch_model.openclip_state_dict().items()}
    back = export_openclip_state_dict(convert_openclip_state_dict(sd, CFG), CFG)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(
            back[k].astype(np.float32), sd[k].astype(np.float32), err_msg=k
        )


def test_export_script_roundtrip(tmp_path, rng):
    """Orbax tree -> script export -> .bin -> load_openclip_checkpoint ==
    the original tree (covers the CLI path + torch serialization)."""
    import orbax.checkpoint as ocp

    from tapclip_tpu.utils.torch_convert import load_openclip_checkpoint

    params = C.init_clip_params(jax.random.PRNGKey(7), CFG)
    src = tmp_path / "tree"
    ocp.PyTreeCheckpointer().save(str(src), jax.tree.map(np.asarray, params))
    dst = tmp_path / "exported.bin"
    convert_checkpoint.main(
        ["export", "--src", str(src), "--model", "parity-test", "--dst", str(dst)]
    )
    back = load_openclip_checkpoint(str(dst), CFG)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.tree.map(np.asarray, params),
        back,
    )


def test_export_resnet_roundtrip():
    """RN-family: export -> import == identity on our side (conv layout,
    BN stats, bottleneck downsample keys, attnpool)."""
    from tapclip_tpu.config import CLIPConfig
    from tapclip_tpu.utils.torch_convert import (
        convert_openclip_state_dict,
        export_openclip_state_dict,
    )

    rcfg = CLIPConfig(
        name="rn-export-test", vision_tower="resnet", image_size=64,
        vision_width=16, resnet_layers=(1, 1, 1, 1), vocab_size=100,
        context_length=12, text_width=16, text_layers=2, text_heads=2,
        embed_dim=24,
    )
    params = C.init_clip_params(jax.random.PRNGKey(2), rcfg)
    params = jax.tree.map(np.asarray, params)
    back = convert_openclip_state_dict(
        export_openclip_state_dict(params, rcfg), rcfg
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        back,
    )


def test_export_rejects_training_extras(rng):
    from tapclip_tpu.utils.torch_convert import export_openclip_state_dict

    params = C.init_clip_params(jax.random.PRNGKey(0), CFG)
    params = dict(params, kd_proj={"w": np.zeros((4, 4), np.float32)})
    with pytest.raises(ValueError, match="kd_proj"):
        export_openclip_state_dict(params, CFG)


def test_export_logit_bias_passthrough():
    from tapclip_tpu.pretrain import add_siglip_params
    from tapclip_tpu.utils.torch_convert import export_openclip_state_dict

    params = add_siglip_params(C.init_clip_params(jax.random.PRNGKey(0), CFG))
    sd = export_openclip_state_dict(params, CFG)
    assert "logit_bias" in sd and sd["logit_bias"].shape == ()


def test_prompt_export_roundtrip(tmp_path, rng):
    """Tuned prompts -> reference .pt (both layouts) -> reimport == identity,
    through the actual CLI + an Orbax prompt checkpoint."""
    from tapclip_tpu.utils.checkpoint import save_prompt_checkpoint
    from tapclip_tpu.utils.torch_convert import (
        load_reference_prompt_checkpoint,
    )
    from tapclip_tpu.models.prompt_learner import PromptLearner
    from tapclip_tpu.config import PromptConfig
    from tapclip_tpu.data.tokenizer import get_tokenizer

    cfg = CFG.replace(vocab_size=520)
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    classes = ["Backpack", "Pen"]
    pl = PromptLearner(classes, params, cfg, PromptConfig(max_classes=4),
                       get_tokenizer(None, cfg.context_length))
    ctx = rng.standard_normal((4, 5, cfg.text_width)).astype(np.float32)
    src = tmp_path / "prompt_ckpt"
    save_prompt_checkpoint(
        str(src), trainable={"ctx": ctx, "adjustor": {}},
        bank=pl.bank, class_names=classes,
    )

    for legacy in (False, True):
        dst = tmp_path / f"ref_{legacy}.pt"
        argv = ["prompt-export", "--src", str(src), "--dst", str(dst)]
        if legacy:
            argv.append("--legacy")
        convert_checkpoint.main(argv)
        by_name, extras = load_reference_prompt_checkpoint(str(dst), classes)
        assert set(by_name) == set(classes)
        for i, name in enumerate(classes):
            np.testing.assert_array_equal(by_name[name], ctx[i])
