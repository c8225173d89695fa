"""Prompt adjustor: reweight context vectors by attribution scores.

Pure-function rebuild of ``/root/reference/models/prompt_adjustor.py``.
Three methods (``prompt_adjustor.py:9``):

* ``scale``    — elementwise ``prompt * attribution`` (:35-36); used by every
                 reference driver (``train.py:61``, ``test_cross_domain.py:40``).
* ``gate``     — ``Linear(1,64) -> ReLU -> Linear(64,1) -> Sigmoid`` gating
                 (:13-19, :38-40).
* ``residual`` — ``Linear(1,64) -> ReLU -> Linear(64,D)`` added to the prompt
                 (:20-24, :42-44).  The reference hardcodes D=512 (:24); here
                 D follows the model's text width.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

ADJUSTOR_METHODS = ("scale", "gate", "residual")


def init_adjustor_params(
    key: jax.Array, method: str, dim: int, hidden: int = 64
) -> Dict[str, Any]:
    """Adjustor params; empty dict for the parameter-free 'scale' method."""
    if method == "scale":
        return {}
    k1, k2 = jax.random.split(key)
    out_dim = 1 if method == "gate" else dim
    # torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    w1 = jax.random.uniform(k1, (1, hidden), jnp.float32, -1.0, 1.0)
    b1 = jnp.zeros((hidden,), jnp.float32)
    bound2 = hidden ** -0.5
    w2 = jax.random.uniform(k2, (hidden, out_dim), jnp.float32, -bound2, bound2)
    b2 = jnp.zeros((out_dim,), jnp.float32)
    if method not in ADJUSTOR_METHODS:
        raise ValueError(f"Unknown method: {method}")
    return {"w1": w1, "b1": b1, "w2": w2, "b2": b2}


def adjust_prompt(
    params: Dict[str, Any],
    method: str,
    prompt_embed: jnp.ndarray,  # [..., P, D]
    attribution: jnp.ndarray,  # [..., P]
) -> jnp.ndarray:
    if method not in ADJUSTOR_METHODS:
        raise ValueError(f"Unknown method: {method}")  # prompt_adjustor.py:46-47
    a = attribution[..., None].astype(prompt_embed.dtype)  # [..., P, 1]
    if method == "scale":
        return prompt_embed * a
    h = jax.nn.relu(a @ params["w1"].astype(a.dtype) + params["b1"].astype(a.dtype))
    out = h @ params["w2"].astype(a.dtype) + params["b2"].astype(a.dtype)
    if method == "gate":
        return prompt_embed * jax.nn.sigmoid(out)
    if method == "residual":
        return prompt_embed + out
    raise ValueError(f"Unknown method: {method}")
