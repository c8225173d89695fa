"""Checkpoint save / restore (Orbax) + reference ``.pt`` interop.

The reference saves raw ``state_dict`` pickles of the best model
(``/root/reference/train.py:131-133``) with no optimizer state and no resume
support (SURVEY.md §5).  Here:

* ``save_prompt_checkpoint`` / ``restore_prompt_checkpoint`` — Orbax
  checkpoints of the prompt-tuning state: trainable params, prompt bank,
  class names, step.  Supports exact mid-training resume (optimizer state
  included when given).
* ``load_any_prompt_checkpoint`` — also accepts the reference's ``.pt``
  layouts (legacy stacked ``context_emb`` and per-class ``context_bank``)
  via :mod:`tapclip_tpu.utils.torch_convert`.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np

_META_NAME = "tapclip_meta.json"


def _bank_as_dict(bank) -> Dict[str, np.ndarray]:
    """PromptBank (custom pytree node) -> plain dict Orbax can restore
    without a target structure."""
    if isinstance(bank, dict) or bank is None:
        return bank
    return {
        "ctx": np.asarray(bank.ctx),
        "token_embs": np.asarray(bank.token_embs),
        "class_mask": np.asarray(bank.class_mask),
        "eot_pos": np.asarray(bank.eot_pos),
    }


def bank_from_dict(d: Dict[str, np.ndarray]):
    import jax.numpy as jnp

    from tapclip_tpu.models.prompt_learner import PromptBank

    return PromptBank(
        ctx=jnp.asarray(d["ctx"]),
        token_embs=jnp.asarray(d["token_embs"]),
        class_mask=jnp.asarray(d["class_mask"]),
        eot_pos=jnp.asarray(d["eot_pos"]),
    )


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_prompt_checkpoint(
    path: str,
    *,
    trainable: Dict[str, Any],
    bank,
    class_names: Sequence[str],
    opt_state: Any = None,
    step: int = 0,
    extra_meta: Optional[Dict[str, Any]] = None,
) -> str:
    """Write an Orbax checkpoint directory at ``path``."""
    path = os.path.abspath(path)
    tree = {
        "trainable": jax.tree.map(np.asarray, trainable),
        "bank": _bank_as_dict(bank),
    }
    if opt_state is not None:
        tree["opt_state"] = jax.tree.map(np.asarray, opt_state)
    _checkpointer().save(path, tree, force=True)
    meta = {
        "class_names": list(class_names),
        "step": int(step),
        **(extra_meta or {}),
    }
    with open(os.path.join(path, _META_NAME), "w") as f:
        json.dump(meta, f, indent=2)
    return path


def restore_prompt_checkpoint(path: str) -> Dict[str, Any]:
    """Restore an Orbax prompt checkpoint -> {tree..., 'meta': {...}}."""
    path = os.path.abspath(path)
    tree = _checkpointer().restore(path)
    meta_path = os.path.join(path, _META_NAME)
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    tree = dict(tree)
    tree["meta"] = meta
    return tree


def load_any_prompt_checkpoint(
    path: str, seen_class_names: Sequence[str]
) -> Dict[str, Any]:
    """Load either an Orbax dir or a reference ``.pt`` file.

    Returns a dict with at least ``ctx_by_name`` ({class: [P, D]}) and
    optionally ``logit_scale``, ``meta``.
    """
    if os.path.isdir(path):
        tree = restore_prompt_checkpoint(path)
        names = tree["meta"].get("class_names", list(seen_class_names))
        ctx = np.asarray(tree["trainable"]["ctx"])
        return {
            "ctx_by_name": {n: ctx[i] for i, n in enumerate(names)},
            "logit_scale": np.asarray(tree["trainable"].get("logit_scale")),
            "meta": tree["meta"],
            "trainable": tree["trainable"],
            "bank": tree.get("bank"),
        }
    from tapclip_tpu.utils.torch_convert import load_reference_prompt_checkpoint

    ctx_by_name, extras = load_reference_prompt_checkpoint(path, seen_class_names)
    out: Dict[str, Any] = {"ctx_by_name": ctx_by_name, "meta": {}}
    out.update(extras)
    return out
