"""AOT export (jax.export / StableHLO) round-trip tests.

Deployment parity note: the reference deploys pickled state dicts that need
the model *code* at load time (``/root/reference/train.py:131-133``); the
export artifacts here carry the computation itself, so these tests verify
(a) numeric identity of the rehydrated programs, (b) that weights are NOT
baked into the artifact, and (c) batch-polymorphic export on the XLA
attention path.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapclip_tpu.config import PromptConfig
from tapclip_tpu.data.tokenizer import get_tokenizer
from tapclip_tpu.models import clip as clip_model
from tapclip_tpu.models.model_wrapper import (
    full_model_forward,
    init_trainable,
    text_features_with_attribution,
)
from tapclip_tpu.models.prompt_learner import PromptLearner
from tapclip_tpu.utils import model_export as ME

CLASSES = ["Backpack", "Pen", "Mug"]


@pytest.fixture(scope="module")
def setup(tiny_cfg, tiny_params):
    pcfg = PromptConfig(max_classes=4)
    learner = PromptLearner(
        CLASSES,
        tiny_params,
        tiny_cfg,
        pcfg,
        get_tokenizer(context_length=tiny_cfg.context_length),
    )
    trainable = init_trainable(jax.random.PRNGKey(1), learner, pcfg)
    return pcfg, learner, trainable


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory, tiny_cfg, tiny_params, setup):
    pcfg, learner, trainable = setup
    out = str(tmp_path_factory.mktemp("export"))
    ME.export_model(
        out,
        tiny_params,
        tiny_cfg,
        pcfg,
        trainable,
        learner.bank,
        batch=2,
        functions=ME.EXPORTABLE_FUNCTIONS,
    )
    return out


def _images(tiny_cfg, B=2, seed=3):
    return jax.random.normal(
        jax.random.PRNGKey(seed), (B, tiny_cfg.image_size, tiny_cfg.image_size, 3)
    )


def test_encode_roundtrip_exact(artifact_dir, tiny_cfg, tiny_params):
    fns = ME.load_exported(artifact_dir)
    imgs = _images(tiny_cfg)
    ref = clip_model.l2_normalize(
        clip_model.encode_image(tiny_params, tiny_cfg, imgs)
    ).astype(jnp.float32)
    np.testing.assert_allclose(fns["encode_image"](tiny_params, imgs), ref,
                               atol=1e-6)
    toks = jax.random.randint(
        jax.random.PRNGKey(7), (2, tiny_cfg.context_length), 0, 200, jnp.int32
    )
    reft = clip_model.l2_normalize(
        clip_model.encode_text(tiny_params, tiny_cfg, toks)
    ).astype(jnp.float32)
    np.testing.assert_allclose(fns["encode_text"](tiny_params, toks), reft,
                               atol=1e-6)


def test_full_forward_matches_model(artifact_dir, tiny_cfg, tiny_params, setup):
    pcfg, learner, trainable = setup
    fns = ME.load_exported(artifact_dir)
    imgs = _images(tiny_cfg, seed=11)
    got = fns["full_forward"](
        tiny_params, trainable, ME._bank_to_plain(learner.bank), imgs
    )
    ref = full_model_forward(
        tiny_params, trainable, learner.bank, imgs, None,
        clip_cfg=tiny_cfg, prompt_cfg=pcfg,
    )
    np.testing.assert_allclose(got["logits"], ref["logits"], atol=1e-5)
    np.testing.assert_allclose(got["attribution"], ref["attribution"], atol=1e-6)


def test_classify_matches_serving_semantics(
    artifact_dir, tiny_cfg, tiny_params, setup
):
    pcfg, learner, trainable = setup
    fns = ME.load_exported(artifact_dir)
    bank = learner.bank
    feats, _ = text_features_with_attribution(
        tiny_params, trainable["ctx"], bank, tiny_cfg, pcfg, trainable["adjustor"]
    )
    imgs = _images(tiny_cfg, seed=13)
    scale = jnp.asarray(trainable["logit_scale"], jnp.float32)
    got = fns["classify"](
        tiny_params, feats.astype(jnp.float32), scale, bank.class_mask, imgs
    )
    img = clip_model.l2_normalize(
        clip_model.encode_image(tiny_params, tiny_cfg, imgs)
    ).astype(jnp.float32)
    ref = jnp.exp(scale) * (img @ feats.astype(jnp.float32).T)
    ref = jnp.where(bank.class_mask[None, :], ref, jnp.float32(-1e30))
    np.testing.assert_allclose(got, ref, atol=1e-4)
    # padded class slots masked out
    assert np.all(np.asarray(got)[:, len(CLASSES):] < -1e29)


def test_weights_not_baked(artifact_dir):
    """Artifacts must stay program-sized — params are call-time arguments."""
    manifest = ME.load_manifest(artifact_dir)
    for name, meta in manifest["functions"].items():
        assert meta["bytes"] < 2**20, (name, meta["bytes"])
        path = os.path.join(artifact_dir, meta["file"])
        assert os.path.getsize(path) == meta["bytes"]


def test_manifest_contents(artifact_dir, tiny_cfg):
    manifest = ME.load_manifest(artifact_dir)
    assert manifest["format"].startswith("tapclip_tpu.model_export/")
    assert manifest["jax_version"] == jax.__version__
    assert manifest["model_config"]["image_size"] == tiny_cfg.image_size
    assert set(manifest["functions"]) == set(ME.EXPORTABLE_FUNCTIONS)
    for meta in manifest["functions"].values():
        assert meta["platforms"] == ["cpu"]
        assert meta["in_avals"] and meta["out_avals"]


def test_symbolic_batch_one_artifact_many_batches(
    tmp_path, tiny_cfg, tiny_params
):
    cfg = tiny_cfg.replace(attn_impl="xla")
    exported = ME.export_functions(
        tiny_params, cfg, batch=2, functions=("encode_image",),
        symbolic_batch=True,
    )
    out = ME.save_exported(str(tmp_path / "poly"), exported, cfg)
    fns = ME.load_exported(out)
    for B in (1, 3, 5):
        imgs = _images(cfg, B=B, seed=B)
        ref = clip_model.l2_normalize(
            clip_model.encode_image(tiny_params, cfg, imgs)
        ).astype(jnp.float32)
        np.testing.assert_allclose(fns["encode_image"](tiny_params, imgs), ref,
                                   atol=1e-5)


def test_symbolic_batch_requires_xla_attn(tiny_cfg, tiny_params):
    with pytest.raises(ValueError, match="attn_impl"):
        ME.export_functions(
            tiny_params, tiny_cfg.replace(attn_impl="pallas"), batch=2,
            functions=("encode_image",), symbolic_batch=True,
        )


def test_unknown_function_rejected(tiny_cfg, tiny_params):
    with pytest.raises(ValueError, match="unknown export function"):
        ME.export_functions(tiny_params, tiny_cfg, functions=("nope",))


def test_cli_end_to_end(tmp_path):
    import scripts.export_model as cli

    out = cli.main([
        "--preset", "tiny", "--out", str(tmp_path / "cli"), "--batch", "2",
        "--functions", "encode_image", "classify",
    ])
    manifest = ME.load_manifest(out)
    assert set(manifest["functions"]) == {"encode_image", "classify"}
    npz = np.load(os.path.join(out, "class_features.npz"))
    assert npz["text_feats"].shape[0] == npz["class_mask"].shape[0]
    assert npz["class_names"].shape[0] == int(npz["class_mask"].sum())
    # manifest is valid JSON on disk
    with open(os.path.join(out, ME.MANIFEST_NAME)) as f:
        json.load(f)


def test_multi_platform_export_from_cpu_host(tmp_path, tiny_cfg, tiny_params):
    """TPU-deployable artifacts can be BUILT on a CPU host: jax.export
    cross-lowers for every named platform without needing the device.
    (With attn_impl='xla'; the 'auto' Pallas dispatch resolves by the
    tracing host's backend, so export Pallas-kernel artifacts on-TPU.)"""
    cfg = tiny_cfg.replace(attn_impl="xla")
    exported = ME.export_functions(
        tiny_params, cfg, batch=2, functions=("encode_image",),
        platforms=("tpu", "cpu"),
    )
    out = ME.save_exported(str(tmp_path / "xplat"), exported, cfg)
    meta = ME.load_manifest(out)["functions"]["encode_image"]
    assert meta["platforms"] == ["tpu", "cpu"]
    fns = ME.load_exported(out)
    imgs = _images(cfg)
    ref = clip_model.l2_normalize(
        clip_model.encode_image(tiny_params, cfg, imgs)
    ).astype(jnp.float32)
    np.testing.assert_allclose(fns["encode_image"](tiny_params, imgs), ref,
                               atol=1e-6)
