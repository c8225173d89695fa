"""tapclip_tpu — TPU-native rebuild of TAP-CLIP (attribution-guided prompt
tuning for CLIP) on JAX / Pallas / pjit.

Reference: 3300786/TAP-CLIP (PyTorch, single GPU). This package is a
from-scratch TPU-first framework with the same capabilities: from-scratch
CLIP towers, fused attention kernels that materialize attribution slices,
class-batched prompt tuning, sharded multi-chip train/eval, OfficeHome /
DomainNet cross-domain transfer drivers, checkpointing with legacy ``.pt``
migration, and output-compatible metrics/CSV/plots.
"""

__version__ = "0.1.0"

from tapclip_tpu import config  # noqa: F401

# Lazy top-level API (mirrors the reference's import surface:
# `from models.model_wrapper import FullModel` etc. become
# `from tapclip_tpu import FullModel`).  Lazy so `import tapclip_tpu`
# doesn't pull jax/PIL until used.
_LAZY = {
    "FullModel": ("tapclip_tpu.models.model_wrapper", "FullModel"),
    "CLIPWrapper": ("tapclip_tpu.models.clip_wrapper", "CLIPWrapper"),
    "PromptLearner": ("tapclip_tpu.models.prompt_learner", "PromptLearner"),
    "get_dataloaders": ("tapclip_tpu.data.imagefolder", "get_dataloaders"),
    "get_tokenizer": ("tapclip_tpu.data.tokenizer", "get_tokenizer"),
    "evaluate_accuracy": ("tapclip_tpu.utils.eval_metrics", "evaluate_accuracy"),
    "evaluate_per_class_accuracy": (
        "tapclip_tpu.utils.eval_metrics",
        "evaluate_per_class_accuracy",
    ),
    "make_mesh": ("tapclip_tpu.parallel.mesh", "make_mesh"),
    "fit_prompt_model": ("tapclip_tpu.trainer", "fit_prompt_model"),
    # session-6 deployment surface
    "make_pretrain_step": ("tapclip_tpu.pretrain", "make_pretrain_step"),
    "featurize_images": ("tapclip_tpu.featurize", "featurize_images"),
    "SearchIndex": ("tapclip_tpu.search", "SearchIndex"),
    "fit_linear_probe": ("tapclip_tpu.linear_probe", "fit_linear_probe"),
    "build_cache_model": ("tapclip_tpu.tip_adapter", "build_cache_model"),
    "tip_logits": ("tapclip_tpu.tip_adapter", "tip_logits"),
    "fit_clip_adapter": ("tapclip_tpu.clip_adapter", "fit_clip_adapter"),
    "fit_maple": ("tapclip_tpu.maple", "fit_maple"),
    "patch_saliency": ("tapclip_tpu.utils.saliency", "patch_saliency"),
    "PredictService": ("tapclip_tpu.serve", "PredictService"),
    "predict_corpus": ("tapclip_tpu.predict", "predict_corpus"),
    "export_model": ("tapclip_tpu.utils.model_export", "export_model"),
    "load_exported": ("tapclip_tpu.utils.model_export", "load_exported"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'tapclip_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
