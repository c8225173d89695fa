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

**FSDP / ZeRO** (``fsdp=True``): the big GEMM weights and embeddings
additionally shard a *non-TP* dim over the ``data`` axis, so each
data-parallel rank stores only ``1/dp`` of the parameters — and, via
``shard_opt_state``, ``1/dp`` of the AdamW moments (ZeRO-3 semantics,
expressed purely as GSPMD annotations: XLA all-gathers a weight just
before its GEMM and reduce-scatters its gradient, the optimizer update
then runs shard-local).  The per-step collective volume is the same
all-reduce-equivalent DP already pays; memory drops by ``~3x/dp`` for
the (param, mu, nu) triple.  See ``jax-ml.github.io/scaling-book``'s
FSDP recipe — this is that, with the tensor-parallel dim kept for the
``model`` axis.

FSDP composes with pipeline parallelism: the pipe axis owns the leading
layer dim, FSDP's data dim lands on a trailing non-TP GEMM dim, so a
block weight can shard all three ways at once (``w_qkv [L, W, 3W] ->
P("pipe", "data", "model")``).  Memory multiplies (1/pp of the layers x
1/dp of each layer's triple); the cost is that GSPMD's just-in-time
weight all-gather happens inside the GPipe tick loop, i.e. once per
tick rather than once per step — the standard ZeRO+GPipe trade.  Pinned
in tests/test_fsdp.py::test_fsdp_composes_with_pipeline.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tapclip_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, PIPE_AXIS


def _spec_for_path(path: str, tp: bool, pp: bool = False,
                   fsdp: bool = False) -> P:
    # Pipeline parallelism: the stacked-leaf layer axis ([L, ...], leading)
    # of the transformer block pytrees shards over "pipe" — each stage holds
    # L/S contiguous layers (parallel/pipeline.py). Composes with the
    # Megatron TP columns/rows below on the trailing dims.
    layer_ax = PIPE_AXIS if (pp and "blocks/" in path) else None
    m = MODEL_AXIS if tp else None
    # FSDP: the data axis lands on whichever big-GEMM dim TP does NOT own.
    d = DATA_AXIS if fsdp else None
    if fsdp:
        # Embeddings / projections: the vocab / patch / width dim over data.
        if path.endswith(("token_embedding", "patch_embed/w",
                          "text_projection", "visual/proj")):
            return P(DATA_AXIS, None)
    if layer_ax is None and m is None and d is None:
        return P()
    # Expert parallelism (models/moe.py): the expert axis (dim 1 of the
    # stacked [L, E, ...] leaves) shards over "model" — each shard owns an
    # expert subset, its GEMMs run local, and XLA reduces the combine
    # einsum over ICI (same mechanism as the Megatron TP rows below).
    # The router stays replicated (it is [W, E], KBs).
    if "/moe/" in path:
        if path.endswith("router/w"):
            return P(layer_ax) if layer_ax else P()
        leaf_name = path.rsplit("/", 1)[-1]
        if leaf_name in ("w_fc", "w_proj"):
            # [L, E, in, out]: experts on model, the (large) dim-2 on data.
            return P(layer_ax, m, d, None)
        return P(layer_ax, m, None)  # b_fc [L, E, 4W] / b_proj [L, E, W]
    if path.endswith("attn/w_qkv"):
        return P(layer_ax, d, m)
    if path.endswith("attn/b_qkv"):
        return P(layer_ax, m)
    if path.endswith("attn/w_out"):
        return P(layer_ax, m, d)
    if path.endswith("mlp/w_fc"):
        return P(layer_ax, d, m)
    if path.endswith("mlp/b_fc"):
        return P(layer_ax, m)
    if path.endswith("mlp/w_proj"):
        return P(layer_ax, m, d)
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


def _guard_rank(spec: P, leaf: Any) -> P:
    """Replicate any leaf whose rank can't carry the suffix-matched spec
    (defensive: opt-state scalars, squeezed variants)."""
    ndim = getattr(leaf, "ndim", None)
    if ndim is not None and len(spec) > ndim:
        return P()
    return spec


def clip_param_specs(params: Dict[str, Any], mesh: Mesh,
                     fsdp: bool = False) -> Dict[str, Any]:
    """PartitionSpec pytree for the CLIP param tree."""
    tp = mesh.shape.get(MODEL_AXIS, 1) > 1
    pp = mesh.shape.get(PIPE_AXIS, 1) > 1
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _guard_rank(
            _spec_for_path(_path_str(path), tp, pp, fsdp), leaf
        ),
        params,
    )


def shard_params(params: Dict[str, Any], mesh: Mesh,
                 fsdp: bool = False) -> Dict[str, Any]:
    """Place CLIP params on the mesh with TP (+ optional FSDP) shardings."""
    specs = clip_param_specs(params, mesh, fsdp=fsdp)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_opt_state(opt_state: Any, mesh: Mesh, fsdp: bool = False) -> Any:
    """Place an optax state on the mesh, mirroring the param shardings.

    AdamW's ``mu``/``nu`` (and ``MultiSteps``' grad accumulator) are pytrees
    whose leaf *paths end with the same suffixes* as the params they track,
    so the same path->spec rules apply leaf-for-leaf; scalars (step counts)
    and unrecognized leaves replicate.  With ``fsdp=True`` this is the
    ZeRO side of FSDP: each data rank holds 1/dp of the moments and updates
    only its own param shards."""
    tp = mesh.shape.get(MODEL_AXIS, 1) > 1
    pp = mesh.shape.get(PIPE_AXIS, 1) > 1
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(
            leaf,
            NamedSharding(
                mesh,
                _guard_rank(
                    _spec_for_path(_path_str(path), tp, pp, fsdp), leaf
                ),
            ),
        ),
        opt_state,
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
