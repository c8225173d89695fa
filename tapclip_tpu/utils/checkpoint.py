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


def apply_prompt_checkpoint(model, path: str) -> None:
    """Load a prompt checkpoint (Orbax dir or reference ``.pt``) into a live
    ``FullModel``: context vectors by class name (unseen names grow the
    bank), trained ctx synced into ``model.trainable``, logit_scale when
    present.  The shared --ckpt path of serve / predict / export_model."""
    import jax.numpy as jnp

    tree = load_any_prompt_checkpoint(path, list(model.class_names))
    model.prompt_learner.load_ctx(tree["ctx_by_name"])
    model.trainable = dict(model.trainable, ctx=model.prompt_learner.bank.ctx)
    if tree.get("logit_scale") is not None and np.size(tree["logit_scale"]):
        model.trainable = dict(
            model.trainable, logit_scale=jnp.asarray(tree["logit_scale"])
        )


class CheckpointManager:
    """Retention + async policies over ``save_prompt_checkpoint``.

    The reference keeps exactly one ``state_dict`` pickle of the final best
    model (``/root/reference/train.py:131-133``).  Production training wants
    more: periodic preemption-safe snapshots, the N best-by-metric kept, and
    saves that do not block the train loop on serialization.  This manager
    layers those policies without changing the on-disk format — every
    checkpoint stays an ordinary Orbax dir restorable by
    ``restore_prompt_checkpoint``.

    * ``keep_last_n`` — most recent checkpoints retained (resume safety).
    * ``keep_best_n`` — best-by-``metric`` checkpoints retained
      (``mode='max'`` for accuracy, ``'min'`` for loss).  A checkpoint in
      both sets is stored once.
    * ``async_save=True`` — the Orbax write (and retention sweep) runs on a
      single background worker; the device trees are snapshotted to host
      numpy *before* dispatch, so the step's arrays can be donated/mutated
      immediately.  Call :meth:`wait` (or use as a context manager) before
      reading the files.
    """

    _INDEX = "manager_index.json"

    def __init__(
        self,
        directory: str,
        *,
        keep_last_n: int = 2,
        keep_best_n: int = 0,
        mode: str = "max",
        async_save: bool = False,
    ):
        if mode not in ("max", "min"):
            raise ValueError(f"mode must be 'max' or 'min', got {mode!r}")
        self.directory = os.path.abspath(directory)
        self.keep_last_n = keep_last_n
        self.keep_best_n = keep_best_n
        self.mode = mode
        os.makedirs(self.directory, exist_ok=True)
        # [(step, path, metric-or-None)] in save order; _lock guards it
        # against the async worker's retention sweep.
        import threading

        self._lock = threading.Lock()
        self._records = []
        # every path this manager has ever recorded (sweep only touches these)
        self._known = set()
        self._load_index()
        self._pool = None
        self._pending = []
        if async_save:
            import concurrent.futures

            self._pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ckpt-mgr"
            )

    # -- public API ---------------------------------------------------------

    def save(
        self,
        *,
        step: int,
        trainable: Dict[str, Any],
        bank,
        class_names: Sequence[str],
        opt_state: Any = None,
        metric: Optional[float] = None,
        extra_meta: Optional[Dict[str, Any]] = None,
    ) -> str:
        """Queue (or perform) a checkpoint write; returns its path."""
        path = os.path.join(self.directory, f"step_{step:08d}")
        # Host snapshot up front: correctness under async (the caller may
        # donate/overwrite the device buffers right after this returns).
        # np.array (not np.asarray): on the CPU backend np.asarray of a
        # jax.Array can be a zero-copy view, which a later donated-buffer
        # step could mutate while the queued write still reads it.
        snap = lambda a: np.array(a)  # noqa: E731
        trainable = jax.tree.map(snap, trainable)
        bank = _bank_as_dict(bank)
        if bank is not None:
            bank = {k: np.array(v) for k, v in bank.items()}
        if opt_state is not None:
            opt_state = jax.tree.map(snap, opt_state)
        meta = dict(extra_meta or {})
        if metric is not None:
            meta["metric"] = float(metric)
        args = (path, trainable, bank, list(class_names), opt_state, step, meta)
        with self._lock:
            self._records.append(
                (int(step), path, None if metric is None else float(metric))
            )
            self._known.add(path)
        if self._pool is None:
            self._write_and_sweep(*args)
        else:
            self._pending.append(self._pool.submit(self._write_and_sweep, *args))
        return path

    def wait(self) -> None:
        """Block until every queued save (and retention sweep) completed."""
        pending, self._pending = self._pending, []
        for f in pending:
            f.result()  # re-raises worker exceptions

    def close(self) -> None:
        self.wait()
        if self._pool is not None:
            self._pool.shutdown(wait=True)
            self._pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    @property
    def latest_path(self) -> Optional[str]:
        kept = self._kept()
        recs = [r for r in self._records if r[1] in kept]
        return max(recs, key=lambda r: r[0])[1] if recs else None

    @property
    def best_path(self) -> Optional[str]:
        scored = [r for r in self._records if r[2] is not None]
        if not scored:
            return None
        pick = max if self.mode == "max" else min
        return pick(scored, key=lambda r: r[2])[1]

    def all_paths(self):
        return [r[1] for r in self._records if r[1] in self._kept()]

    # -- internals ----------------------------------------------------------

    def _kept(self):
        # Sort by step only: the metric slot mixes None and floats (a
        # re-save of the same step without a metric must not TypeError).
        by_step = sorted(self._records, key=lambda r: r[0])
        last = {r[1] for r in by_step[-self.keep_last_n:]} \
            if self.keep_last_n > 0 else set()
        scored = sorted(
            (r for r in self._records if r[2] is not None),
            key=lambda r: r[2],
            reverse=self.mode == "max",
        )
        best = {r[1] for r in scored[: self.keep_best_n]}
        return last | best

    def _write_and_sweep(self, path, trainable, bank, class_names, opt_state,
                         step, meta):
        tree = {"trainable": trainable, "bank": bank}
        if opt_state is not None:
            tree["opt_state"] = opt_state
        _checkpointer().save(path, tree, force=True)
        with open(os.path.join(path, _META_NAME), "w") as f:
            json.dump({"class_names": class_names, "step": step, **meta}, f,
                      indent=2)
        self._sweep()
        self._save_index()

    def _sweep(self):
        import shutil

        with self._lock:
            keep = self._kept()
            self._records = [r for r in self._records if r[1] in keep]
            known = set(self._known)
        # Delete ONLY checkpoints this manager has recorded (this session or
        # via the index). A step_* directory it has never heard of — index
        # lost to a crash between the Orbax write and _save_index, or a
        # reused directory with foreign checkpoints — is left alone: a leaked
        # directory is recoverable, a deleted resume point is not.
        for p in known - keep:
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)

    def _save_index(self):
        with open(os.path.join(self.directory, self._INDEX), "w") as f:
            json.dump(
                [{"step": s, "path": p, "metric": m} for s, p, m in self._records],
                f,
            )

    def _load_index(self):
        idx = os.path.join(self.directory, self._INDEX)
        if os.path.exists(idx):
            with open(idx) as f:
                self._records = [
                    (r["step"], r["path"], r.get("metric"))
                    for r in json.load(f)
                    if os.path.isdir(r["path"])
                ]
            self._known.update(r[1] for r in self._records)


# ---------------------------------------------------------------------------
# Sharded (multi-device) snapshots — no host gather
# ---------------------------------------------------------------------------
#
# The epoch snapshots above (and the reference's torch.save,
# /root/reference/train.py:131-133) materialize the full tree on the host.
# Under FSDP/TP that gather is exactly the memory the sharding was built to
# avoid, and at multi-host scale every process would write the whole tree.
# These helpers keep jax.Arrays sharded end to end: Orbax's standard
# handler writes each device's shards directly (OCDBT), and restore reads
# only the shards the target sharding asks for — including RESHARDING into
# a different mesh topology than the one that saved.


def save_sharded_snapshot(path: str, tree: Dict[str, Any]) -> None:
    """Save a pytree of (possibly mesh-sharded) ``jax.Array``s in place.

    No ``np.asarray`` host replication: leaves stream from their devices.
    Python ints/floats are saved as 0-d arrays (restore with
    ``int(...)``/``float(...)``).  Synchronous: the checkpoint is committed
    when this returns (preemption-safe when combined with the caller's
    save-then-delete-old ordering).
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
    ckptr.save(os.path.abspath(path), args=ocp.args.StandardSave(tree),
               force=True)


def abstract_target(tree: Any) -> Any:
    """Live tree -> ``ShapeDtypeStruct`` tree carrying each leaf's sharding.

    Pass the result to :func:`restore_sharded_snapshot` to load a snapshot
    straight into the current mesh layout (same or different topology than
    the saver's) without a host round trip.
    """

    def leaf(x):
        if hasattr(x, "sharding"):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return x  # python scalars etc. — restored as saved

    return jax.tree.map(leaf, tree)


def snapshot_format(path: str) -> Optional[str]:
    """Which save path wrote the snapshot at ``path``.

    Returns ``"sharded"`` for :func:`save_sharded_snapshot` output
    (StandardCheckpointHandler), ``"host"`` for the host-gather path's
    ``PyTreeCheckpointer`` output, ``None`` when the directory is not a
    readable Orbax snapshot.  Discriminates on the checkpoint's recorded
    ``item_handlers`` — the on-disk OCDBT layout is shared, so file probing
    cannot tell them apart.
    """
    import orbax.checkpoint as ocp

    try:
        meta = ocp.Checkpointer(ocp.StandardCheckpointHandler()).metadata(
            os.path.abspath(path)
        )
        handler = str(meta.item_handlers)
    except Exception:
        return None
    if "StandardCheckpointHandler" in handler:
        return "sharded"
    if "PyTreeCheckpointHandler" in handler:
        return "host"
    return None


def snapshot_saved_target(path: str, sharding=None) -> Any:
    """The snapshot's OWN structure as a ``ShapeDtypeStruct`` target tree.

    Lets a caller restore a snapshot whose structure has drifted from the
    live program (e.g. an optimizer tweak changed the opt-state tree since
    the save): restore against this as-saved target, then merge leaves into
    the live structure.  ``sharding`` (e.g. a replicated NamedSharding) is
    applied to every array leaf; scalars keep their saved dtype.
    """
    import orbax.checkpoint as ocp

    meta = ocp.Checkpointer(ocp.StandardCheckpointHandler()).metadata(
        os.path.abspath(path)
    )

    def leaf(m):
        shape = getattr(m, "shape", None)
        dtype = getattr(m, "dtype", None)
        if shape is None or dtype is None:
            return m
        if shape == () and getattr(m, "storage", None) is None:
            return jax.ShapeDtypeStruct((), dtype)  # saved python scalar
        return jax.ShapeDtypeStruct(tuple(shape), dtype, sharding=sharding)

    return jax.tree.map(leaf, meta.item_metadata.tree)


def restore_sharded_snapshot(path: str, target: Any) -> Any:
    """Restore a :func:`save_sharded_snapshot` dir into ``target``'s layout.

    ``target`` is a pytree of ``jax.ShapeDtypeStruct`` (see
    :func:`abstract_target`) or live arrays; every restored leaf comes back
    with the target leaf's sharding, resharded from the saved layout if the
    topologies differ.
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
    return ckptr.restore(
        os.path.abspath(path), args=ocp.args.StandardRestore(target)
    )
