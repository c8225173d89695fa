"""AOT model export: serialized StableHLO artifacts via ``jax.export``.

The PyTorch reference deploys by pickling module state dicts and
re-instantiating the model *code* at load time (``/root/reference/train.py:
131-133``, ``test_cross_domain.py:43-61``).  The TPU-native deployment story
is stronger: ``jax.export`` serializes the *computation itself* (StableHLO +
a versioned calling convention), so a serving host can run the model with
jax alone — no tapclip_tpu package, no Python model code, no retracing — and
the artifact is portable across processes and compatible jax releases.

Design choices:

* **Parameters stay call-time arguments** — never baked into the program as
  constants.  This keeps artifacts tiny (the ViT-B program is ~1 MB vs
  ~600 MB of weights), lets one artifact serve many checkpoints, and avoids
  the huge-literal programs that overflow compile RPCs (docs/PERF.md).
* **Plain-container calling convention** — exported functions take only
  dicts / arrays (the :class:`PromptBank` pytree is passed as a plain dict),
  so the loading environment needs no tapclip_tpu pytree registrations.
* **Static shapes by default** (one artifact per batch size — the serving
  pattern, ``serve.py`` bucketing), with opt-in symbolic batch
  (``symbolic_batch=True``) for XLA-attention exports where a single
  artifact must cover every batch size.

Artifact layout (``save_exported``)::

    outdir/
      manifest.json          # jax version, functions, shapes/dtypes, platforms
      <function>.stablehlo   # jax.export serialization (one per function)

Functions exported (``EXPORTABLE_FUNCTIONS``):

* ``encode_image(clip_params, images[B,H,W,3]) -> [B,E]`` unit-norm features
* ``encode_text(clip_params, tokens[B,T] int32) -> [B,E]`` unit-norm features
* ``classify(clip_params, text_feats[C,E], logit_scale, class_mask, images)
  -> logits [B,C]`` — the serving fast path (cached class features)
* ``full_forward(clip_params, trainable, bank, images) -> {logits,
  attribution}`` — the flagship attribution forward (reference
  ``model_wrapper.py:28-100`` semantics)
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Callable, Dict, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tapclip_tpu.config import CLIPConfig, PromptConfig

EXPORTABLE_FUNCTIONS = ("encode_image", "encode_text", "classify", "full_forward")

MANIFEST_NAME = "manifest.json"
_SUFFIX = ".stablehlo"


def _bank_to_plain(bank) -> Dict[str, jnp.ndarray]:
    return {
        "ctx": bank.ctx,
        "token_embs": bank.token_embs,
        "class_mask": bank.class_mask,
        "eot_pos": bank.eot_pos,
    }


def _build_fn(name: str, cfg: CLIPConfig, pcfg: PromptConfig) -> Callable:
    """The pure function behind each exportable entry point."""
    from tapclip_tpu.models import clip as clip_model

    if name == "encode_image":

        def encode_image(clip_params, images):
            f = clip_model.encode_image(clip_params, cfg, images)
            return clip_model.l2_normalize(f).astype(jnp.float32)

        return encode_image

    if name == "encode_text":

        def encode_text(clip_params, token_ids):
            f = clip_model.encode_text(clip_params, cfg, token_ids)
            return clip_model.l2_normalize(f).astype(jnp.float32)

        return encode_text

    if name == "classify":
        # Mirrors serve.py's predict executable: frozen tower + cached
        # class-text features; padded class slots masked to -inf.
        def classify(clip_params, text_feats, logit_scale, class_mask, images):
            f = clip_model.encode_image(clip_params, cfg, images)
            img = clip_model.l2_normalize(f).astype(jnp.float32)
            logits = jnp.exp(logit_scale).astype(jnp.float32) * (
                img @ text_feats.astype(jnp.float32).T
            )
            return jnp.where(class_mask[None, :], logits, jnp.float32(-1e30))

        return classify

    if name == "full_forward":
        from tapclip_tpu.models.model_wrapper import full_model_forward
        from tapclip_tpu.models.prompt_learner import PromptBank

        def full_forward(clip_params, trainable, bank, images):
            out = full_model_forward(
                clip_params,
                trainable,
                PromptBank(
                    bank["ctx"],
                    bank["token_embs"],
                    bank["class_mask"],
                    bank["eot_pos"],
                ),
                images,
                None,
                clip_cfg=cfg,
                prompt_cfg=pcfg,
            )
            return {"logits": out["logits"], "attribution": out["attribution"]}

        return full_forward

    raise ValueError(
        f"unknown export function {name!r}; expected one of {EXPORTABLE_FUNCTIONS}"
    )


def _example_args(
    name: str,
    cfg: CLIPConfig,
    clip_params,
    trainable,
    bank,
    batch: int,
):
    """ShapeDtypeStructs for tracing — never materializes real batch data."""
    shape_of = lambda t: jax.tree.map(  # noqa: E731
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype), t
    )
    images = jax.ShapeDtypeStruct(
        (batch, cfg.image_size, cfg.image_size, 3), jnp.float32
    )
    if name == "encode_image":
        return (shape_of(clip_params), images)
    if name == "encode_text":
        tokens = jax.ShapeDtypeStruct((batch, cfg.context_length), jnp.int32)
        return (shape_of(clip_params), tokens)
    if name == "classify":
        if bank is None:
            raise ValueError("classify export needs a prompt bank (class count)")
        C = bank.ctx.shape[0]
        return (
            shape_of(clip_params),
            jax.ShapeDtypeStruct((C, cfg.embed_dim), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.float32),
            jax.ShapeDtypeStruct((C,), jnp.bool_),
            images,
        )
    if name == "full_forward":
        if trainable is None or bank is None:
            raise ValueError("full_forward export needs trainable + bank")
        return (
            shape_of(clip_params),
            shape_of(trainable),
            shape_of(_bank_to_plain(bank)),
            images,
        )
    raise ValueError(name)


def export_functions(
    clip_params,
    cfg: CLIPConfig,
    pcfg: Optional[PromptConfig] = None,
    trainable=None,
    bank=None,
    *,
    batch: int = 8,
    functions: Iterable[str] = ("encode_image", "encode_text"),
    platforms: Optional[Sequence[str]] = None,
    symbolic_batch: bool = False,
) -> Dict[str, "jax.export.Exported"]:
    """Trace + export the named functions; returns ``{name: Exported}``.

    ``platforms`` defaults to the current jax backend.  ``symbolic_batch``
    replaces the batch dim with a symbolic size ``b`` so one artifact covers
    all batch sizes — requires ``cfg.attn_impl='xla'`` (Pallas grids need
    static shapes).
    """
    from jax import export as jexport

    pcfg = pcfg or PromptConfig()
    if symbolic_batch and cfg.attn_impl not in ("xla",):
        raise ValueError(
            "symbolic_batch requires attn_impl='xla' (Pallas kernels need "
            f"static shapes); got attn_impl={cfg.attn_impl!r}"
        )
    if pcfg.image_conditioned and "classify" in functions:
        raise ValueError(
            "classify cannot be exported for image_conditioned (CoCoOp) "
            "models: text features are per-(sample, class), so a cached "
            "class-feature program serves wrong logits — export "
            "'full_forward' instead (it applies the meta-net conditioning)"
        )
    out: Dict[str, Any] = {}
    for name in functions:
        fn = _build_fn(name, cfg, pcfg)
        args = _example_args(name, cfg, clip_params, trainable, bank, batch)
        if symbolic_batch:
            (b,) = jexport.symbolic_shape("b")
            args = _with_symbolic_batch(name, args, b)
        kwargs = {}
        if platforms is not None:
            kwargs["platforms"] = list(platforms)
        out[name] = jexport.export(jax.jit(fn), **kwargs)(*args)
    return out


def _with_symbolic_batch(name: str, args, b):
    """Swap dim 0 of the data operand(s) for the symbolic batch size."""

    def sym(s: jax.ShapeDtypeStruct):
        return jax.ShapeDtypeStruct((b,) + tuple(s.shape[1:]), s.dtype)

    args = list(args)
    args[-1] = sym(args[-1])  # images / tokens is always the last operand
    return tuple(args)


def save_exported(
    outdir: str,
    exported: Dict[str, "jax.export.Exported"],
    cfg: Optional[CLIPConfig] = None,
    extra: Optional[Dict[str, Any]] = None,
) -> str:
    """Serialize each Exported to ``outdir`` and write the manifest."""
    os.makedirs(outdir, exist_ok=True)
    manifest: Dict[str, Any] = {
        "format": "tapclip_tpu.model_export/1",
        "jax_version": jax.__version__,
        "functions": {},
    }
    if cfg is not None:
        manifest["model_config"] = dataclasses.asdict(cfg)
    if extra:
        manifest.update(extra)
    for name, exp in exported.items():
        blob = exp.serialize()
        with open(os.path.join(outdir, name + _SUFFIX), "wb") as f:
            f.write(blob)
        manifest["functions"][name] = {
            "file": name + _SUFFIX,
            "bytes": len(blob),
            "platforms": list(exp.platforms),
            "calling_convention_version": exp.calling_convention_version,
            "in_avals": [str(a) for a in exp.in_avals],
            "out_avals": [str(a) for a in exp.out_avals],
        }
    with open(os.path.join(outdir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return outdir


def load_exported(path: str) -> Dict[str, Callable]:
    """Load an export directory; returns jit-callable ``{name: fn}``.

    Needs only jax — the callables rehydrate from StableHLO and accept the
    same plain-container arguments the manifest documents.  Each returned fn
    is the deserialized ``Exported.call`` (itself traceable/jittable).
    """
    from jax import export as jexport

    with open(os.path.join(path, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    fns: Dict[str, Callable] = {}
    for name, meta in manifest["functions"].items():
        with open(os.path.join(path, meta["file"]), "rb") as f:
            exp = jexport.deserialize(f.read())
        fns[name] = exp.call
    return fns


def load_manifest(path: str) -> Dict[str, Any]:
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        return json.load(f)


def export_model(
    outdir: str,
    clip_params,
    cfg: CLIPConfig,
    pcfg: Optional[PromptConfig] = None,
    trainable=None,
    bank=None,
    *,
    batch: int = 8,
    functions: Iterable[str] = ("encode_image", "encode_text"),
    platforms: Optional[Sequence[str]] = None,
    symbolic_batch: bool = False,
) -> str:
    """One-call convenience: trace, export, serialize, manifest."""
    exported = export_functions(
        clip_params,
        cfg,
        pcfg,
        trainable,
        bank,
        batch=batch,
        functions=functions,
        platforms=platforms,
        symbolic_batch=symbolic_batch,
    )
    extra = {"batch": None if symbolic_batch else batch}
    return save_exported(outdir, exported, cfg, extra)


def numpy_tree(tree):
    """Host copy of a param tree (handy before export on remote backends)."""
    return jax.tree.map(lambda a: np.asarray(a), tree)
