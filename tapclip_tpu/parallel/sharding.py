"""Sharding rules: logical param layout -> PartitionSpecs.

Tensor-parallel layout for the CLIP towers (Megatron-style, expressed purely
as GSPMD annotations — XLA inserts the all-reduces over ICI):

* ``attn.w_qkv  [L, W, 3W]`` — shard the *output* (head) dim on ``model``;
  each shard holds a head subset, attention is fully local.
* ``attn.w_out  [L, W, W]``  — shard the *input* dim on ``model``; the row
  sum is the all-reduce XLA inserts after the block.
* ``mlp.w_fc    [L, W, 4W]`` — shard hidden dim (column parallel).
* ``mlp.w_proj  [L, 4W, W]`` — shard input dim (row parallel).
* embeddings / layernorms / projections — replicated (small).

Prompt-tuning state (ctx bank, adjustor MLP) is tiny and replicated; the
batch shards on ``data``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tapclip_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, PIPE_AXIS


def _spec_for_path(path: str, tp: bool, pp: bool = False) -> P:
    # Pipeline parallelism: the stacked-leaf layer axis ([L, ...], leading)
    # of the transformer block pytrees shards over "pipe" — each stage holds
    # L/S contiguous layers (parallel/pipeline.py). Composes with the
    # Megatron TP columns/rows below on the trailing dims.
    layer_ax = PIPE_AXIS if (pp and "blocks/" in path) else None
    m = MODEL_AXIS if tp else None
    if layer_ax is None and m is None:
        return P()
    # Expert parallelism (models/moe.py): the expert axis (dim 1 of the
    # stacked [L, E, ...] leaves) shards over "model" — each shard owns an
    # expert subset, its GEMMs run local, and XLA reduces the combine
    # einsum over ICI (same mechanism as the Megatron TP rows below).
    # The router stays replicated (it is [W, E], KBs).
    if "/moe/" in path:
        if path.endswith("router/w"):
            return P(layer_ax) if layer_ax else P()
        n_trailing = {"w_fc": 2, "w_proj": 2, "b_fc": 1, "b_proj": 1}[
            path.rsplit("/", 1)[-1]
        ]
        return P(layer_ax, m, *([None] * n_trailing))
    if path.endswith("attn/w_qkv"):
        return P(layer_ax, None, m)
    if path.endswith("attn/b_qkv"):
        return P(layer_ax, m)
    if path.endswith("attn/w_out"):
        return P(layer_ax, m, None)
    if path.endswith("mlp/w_fc"):
        return P(layer_ax, None, m)
    if path.endswith("mlp/b_fc"):
        return P(layer_ax, m)
    if path.endswith("mlp/w_proj"):
        return P(layer_ax, m, None)
    if layer_ax is not None:
        return P(layer_ax)  # ln scales/biases, attn/mlp output biases
    return P()


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def clip_param_specs(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """PartitionSpec pytree for the CLIP param tree."""
    tp = mesh.shape.get(MODEL_AXIS, 1) > 1
    pp = mesh.shape.get(PIPE_AXIS, 1) > 1
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for_path(_path_str(path), tp, pp), params
    )


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place CLIP params on the mesh with TP sharding annotations."""
    specs = clip_param_specs(params, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    """Shard leading (batch) axis over the data axis."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS))), tree
    )
