"""Standard CLIP zero-shot classification (no prompt tuning).

The reference's README zero-shot rows (``/root/reference/README.md:57-58``,
47.2/52.1/58.4% on OfficeHome) are plain CLIP zero-shot: encode class-name
prompts with the *proper* text encoder (pos emb + causal mask + ln_final +
EOT pooling), L2-normalize, and classify images by scaled cosine similarity.
This module provides that baseline path (BASELINE.json config 1), independent
of the prompt-tuning machinery.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tapclip_tpu.config import CLIPConfig
from tapclip_tpu.models import clip as clip_model

# The OpenAI CLIP prompt-ensemble subset commonly used for ImageNet-style
# zero-shot; single-template default matches the reference's prompt format
# (prompt_learner.py:31).
DEFAULT_TEMPLATES = ("a photo of a {}.",)

OPENAI_IMAGENET_TEMPLATES_SMALL = (
    "a photo of a {}.",
    "a bad photo of a {}.",
    "a photo of many {}.",
    "a photo of the hard to see {}.",
    "a low resolution photo of the {}.",
    "a rendering of a {}.",
    "a bad photo of the {}.",
    "a cropped photo of the {}.",
    "a photo of a hard to see {}.",
    "a bright photo of a {}.",
    "a photo of a clean {}.",
    "a photo of a dirty {}.",
    "a dark photo of the {}.",
    "a drawing of a {}.",
    "a photo of my {}.",
    "a close-up photo of a {}.",
    "a black and white photo of the {}.",
    "a painting of the {}.",
    "a painting of a {}.",
    "a pixelated photo of the {}.",
)


def class_name_to_text(name: str) -> str:
    """Folder names use underscores ("Alarm_Clock"); prompts read better with
    spaces.  The reference feeds the raw name (prompt_learner.py:31); use
    ``raw=True`` paths for strict parity."""
    return name.replace("_", " ")


def build_zero_shot_classifier(
    clip_params,
    cfg: CLIPConfig,
    class_names: Sequence[str],
    tokenizer,
    *,
    templates: Sequence[str] = DEFAULT_TEMPLATES,
    raw_names: bool = False,
    batch_size: int = 64,
    encode_fn=None,
) -> jnp.ndarray:
    """Return ``[n_cls, embed_dim]`` L2-normalized class weight matrix.

    Template-ensembled: each class's embedding is the L2-normalized mean of
    its per-template embeddings (standard CLIP zero-shot recipe).

    ``encode_fn``: a pre-jitted ``(params, ids) -> feats`` — pass one when
    calling repeatedly (e.g. per-epoch validation): the internal
    ``jax.jit(lambda ...)`` keys on function identity, so a fresh wrapper
    per call would retrace every time.
    """
    texts: List[str] = []
    for name in class_names:
        n = name if raw_names else class_name_to_text(name)
        texts.extend(t.format(n) for t in templates)
    ids = tokenizer.tokenize(texts, cfg.context_length)

    encode = encode_fn or jax.jit(
        lambda p, i: clip_model.encode_text(p, cfg, i), static_argnums=()
    )
    feats = []
    for start in range(0, len(texts), batch_size):
        feats.append(np.asarray(encode(clip_params, jnp.asarray(ids[start : start + batch_size]))))
    feats = np.concatenate(feats).reshape(len(class_names), len(templates), -1)
    feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
    mean = feats.mean(axis=1)
    mean = mean / np.linalg.norm(mean, axis=-1, keepdims=True)
    return jnp.asarray(mean)


def zero_shot_logits(
    clip_params, cfg: CLIPConfig, classifier: jnp.ndarray, images: jnp.ndarray
) -> jnp.ndarray:
    """``[B, n_cls]`` scaled cosine logits for preprocessed images."""
    img = clip_model.l2_normalize(clip_model.encode_image(clip_params, cfg, images))
    scale = jnp.exp(clip_params["logit_scale"]).astype(jnp.float32)
    return scale * jnp.einsum(
        "be,ce->bc", img.astype(jnp.float32), classifier.astype(jnp.float32)
    )


def evaluate_zero_shot(
    clip_params,
    cfg: CLIPConfig,
    classifier: jnp.ndarray,
    loader,
    logits_fn=None,
) -> float:
    """Overall accuracy (%) of the zero-shot classifier over a Loader.

    ``logits_fn``: pre-jitted ``(params, classifier, images) -> logits``
    for repeated callers (see ``build_zero_shot_classifier.encode_fn``).
    """
    logits_fn = logits_fn or jax.jit(
        lambda p, c, x: zero_shot_logits(p, cfg, c, x)
    )
    correct = total = 0
    for images, labels, mask in loader:
        logits = np.asarray(logits_fn(clip_params, classifier, jnp.asarray(images)))
        preds = logits.argmax(-1)
        keep = np.asarray(mask)
        correct += int(((preds == np.asarray(labels)) & keep).sum())
        total += int(keep.sum())
    return 100.0 * correct / total if total else 0.0
