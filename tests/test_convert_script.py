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
