"""Pipeline parallelism for the transformer towers (GPipe schedule).

The reference is single-GPU (SURVEY.md §2.2); here the layer stack itself can
be sharded across a ``"pipe"`` mesh axis.  Because the towers store blocks as
stacked-leaf pytrees (``[L, ...]`` per leaf, ``layers.init_blocks``), pipeline
parallelism is just *another sharding of the layer axis*: each of the S pipe
stages holds ``L/S`` contiguous layers, and activations flow stage-to-stage
over ICI via ``lax.ppermute``.

Schedule (GPipe, Huang et al. 2019 — the TPU-native expression):

* the batch splits into M microbatches; the step runs ``M + S - 1`` ticks
  inside one ``lax.scan``;
* every tick, each stage runs its local layers on its current microbatch and
  hands the result to the next stage with a single ring ``ppermute`` —
  stage 0 meanwhile ingests the next microbatch;
* the backward pass needs no hand-written schedule: JAX transposes the
  (scan ∘ ppermute) forward into the reversed-ring backward automatically,
  which *is* the GPipe backward;
* per-tick gradient checkpointing (``remat``) bounds stashed activations to
  one microbatch per stage per live tick — the standard GPipe memory model.

Composability: the ``shard_map`` is *manual over the pipe axis only*
(``axis_names={"pipe"}``); the ``data`` and ``model`` axes stay in GSPMD
auto mode, so data parallelism (sharded batch) and Megatron tensor
parallelism (sharded block weights, `parallel/sharding.py`) compose with the
pipeline without any manual collectives here — XLA keeps inserting those.

The pipe-axis output collection is a masked ``psum`` of the last stage's
microbatch outputs — one extra activation all-reduce over the pipe ring per
step, negligible next to the per-tick traffic and trivially correct.

Intended use is full-tower *pretraining* (``pretrain.make_pretrain_step``
with a pp mesh) for models whose optimizer state + activations exceed one
chip; prompt tuning freezes the towers and never needs pp.  Attribution aux
(the last block's attention column) and int8/token-pruning eval paths are
deliberately unsupported under pp.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from tapclip_tpu.models import layers
from tapclip_tpu.parallel.mesh import PIPE_AXIS

Params = Dict[str, Any]


def _num_layers(blocks: Params) -> int:
    return jax.tree.leaves(blocks)[0].shape[0]


def check_pipeline_geometry(n_layers: int, n_stages: int, batch: int,
                            n_microbatches: int) -> None:
    if n_layers % n_stages != 0:
        raise ValueError(
            f"pipeline: {n_layers} layers not divisible by {n_stages} stages"
        )
    if batch % n_microbatches != 0:
        raise ValueError(
            f"pipeline: batch {batch} not divisible by "
            f"{n_microbatches} microbatches"
        )


def pipeline_transformer_forward(
    x: jnp.ndarray,
    blocks: Params,
    n_heads: int,
    *,
    mesh: Mesh,
    n_microbatches: int,
    act: str,
    ln_eps: float = 1e-5,
    causal: bool = False,
    kv_valid_len=None,
    attn_to_idx=None,
    impl: str = "auto",
    quantize: bool = False,
    quantize_deterministic: bool = False,
    remat: str = "full",
    unroll: int = 1,
    act_sharding=None,
) -> Tuple[jnp.ndarray, None]:
    """Drop-in for ``layers.transformer_forward`` over a ``pipe`` mesh axis.

    ``x`` is the (globally data-sharded) ``[B, T, W]`` activation; ``blocks``
    must be sharded ``P("pipe")`` on the leading layer axis (see
    ``sharding.clip_param_specs``).  Numerics are identical to the sequential
    scan (pinned in tests/test_pipeline.py, values and gradients).

    ``remat`` defaults to "full" here (unlike the sequential scan): GPipe
    holds one in-flight activation per stage per live microbatch, so
    per-tick recompute is the schedule's standard memory model.
    """
    if attn_to_idx is not None:
        raise NotImplementedError(
            "attribution aux is not supported under pipeline parallelism "
            "(prompt tuning freezes the towers; use the sequential tower)"
        )
    if quantize:
        raise NotImplementedError(
            "int8 eval quantization is not supported under pipeline "
            "parallelism (it is an eval-path feature; pp targets training)"
        )
    n_stages = mesh.shape[PIPE_AXIS]
    n_layers = _num_layers(blocks)
    B = x.shape[0]
    check_pipeline_geometry(n_layers, n_stages, B, n_microbatches)

    body = functools.partial(
        layers.block_forward,
        n_heads=n_heads,
        act=act,
        ln_eps=ln_eps,
        causal=causal,
        kv_valid_len=kv_valid_len,
        impl=impl,
    )

    def scan_step(carry, layer_params):
        if act_sharding is not None:
            # Megatron-SP layout constraint on the (auto) data/model axes —
            # legal inside the manual-over-pipe region because the spec
            # touches only auto axes (pinned by test_pipeline.py: the pp+sp
            # step reproduces the dp-only loss). Pass the bare PartitionSpec:
            # a NamedSharding would carry the all-Auto outer mesh, which
            # mismatches the Manual-pipe context mesh in here.
            spec = getattr(act_sharding, "spec", act_sharding)
            carry = jax.lax.with_sharding_constraint(carry, spec)
        y, _ = body(carry, layer_params)
        return y, None

    if remat == "dots":
        scan_step = jax.checkpoint(
            scan_step,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
    elif remat == "full":
        scan_step = jax.checkpoint(scan_step)
    elif remat != "none":
        raise ValueError(f"unknown remat policy {remat!r}")

    M = n_microbatches

    def pipe_body(x_rep, blocks_local):
        stage = jax.lax.axis_index(PIPE_AXIS)
        S = jax.lax.axis_size(PIPE_AXIS)
        mb = x_rep.shape[0] // M
        # STRIDED microbatch split (microbatch m = rows {m, M+m, 2M+m, ...}):
        # the slow [mb] axis then inherits the batch's contiguous "data"
        # sharding, so every microbatch spans all data shards equally and dp
        # composes tick-by-tick (a contiguous split would park each whole
        # microbatch on one data shard).  The inverse permutation below
        # restores exact sample order — per-sample numerics are unaffected.
        xs = x_rep.reshape(mb, M, *x_rep.shape[1:]).swapaxes(0, 1)
        # Bubble ticks: the final S-1 scan steps only drain the pipe; feed
        # zeros (their compute is discarded by the masked psum below).
        pad = jnp.zeros((n_stages - 1,) + xs.shape[1:], xs.dtype)
        xs = jnp.concatenate([xs, pad], axis=0)  # [M+S-1, mb, T, W]

        def local_layers(h):
            y, _ = jax.lax.scan(
                scan_step, h, blocks_local,
                unroll=max(1, min(unroll, n_layers // n_stages)),
            )
            return y

        ring = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(carry, xt):
            recv = jax.lax.ppermute(carry, PIPE_AXIS, ring)
            inp = jnp.where(stage == 0, xt, recv)
            out = local_layers(inp)
            return out, out

        init = jnp.zeros_like(xs[0])
        _, ys = jax.lax.scan(tick, init, xs)  # [M+S-1, mb, T, W]
        outs = ys[n_stages - 1:]  # last stage's valid outputs, [M, mb, T, W]
        outs = jnp.where(stage == S - 1, outs, jnp.zeros_like(outs))
        outs = jax.lax.psum(outs, PIPE_AXIS)
        return outs.swapaxes(0, 1).reshape(x_rep.shape)

    out = shard_map(
        pipe_body,
        mesh=mesh,
        in_specs=(P(), jax.tree.map(lambda _: P(PIPE_AXIS), blocks)),
        out_specs=P(),
        axis_names={PIPE_AXIS},
        check_vma=False,
    )(x, blocks)
    return out, None


def make_pipeline_transformer_fn(
    mesh: Mesh, n_microbatches: int, remat: str = "full"
):
    """A ``transformer_fn`` override for the tower encoders (clip.py): routes
    the block stack through the GPipe schedule, keeping all embed/pool glue
    in one place."""

    def fn(x, blocks, n_heads, **kw):
        kw.pop("remat", None)  # pp has its own (per-tick) remat default
        if kw.pop("quantize", False):
            # fail loudly, never silently un-quantize (same principle as the
            # resnet guard in clip.py)
            raise NotImplementedError(
                "int8 quantization is not supported under pipeline parallelism"
            )
        kw.pop("quantize_deterministic", None)
        return pipeline_transformer_forward(
            x, blocks, n_heads,
            mesh=mesh, n_microbatches=n_microbatches, remat=remat, **kw,
        )

    return fn
