"""CLIP knowledge distillation: compress a frozen teacher into a student.

Beyond-reference subsystem (the reference trains a single model —
``/root/reference/train.py``; nothing in it addresses compression): the
missing lifecycle stage between pretraining a large CLIP and serving a
cheap one.  TinyCLIP / CLIP-KD style, three loss terms:

* **task** — the standard bidirectional InfoNCE on the student's own
  features (``pretrain.contrastive_loss_local`` semantics);
* **kd** — contrastive relational distillation: row-wise
  ``KL(teacher || student)`` over the batch similarity matrix, both
  directions (image->text and text->image), at distillation temperature
  ``tau`` with the classic ``tau^2`` gradient-scale correction.  Each
  model's logits use its *own* calibrated ``logit_scale``, so the teacher's
  neighborhood structure is transferred at the sharpness it was trained at;
* **feat** — feature mimicry: ``1 - cos(proj(student_e), teacher_e)`` per
  modality.  A single learnable ``kd_proj`` linear head bridges an
  embed-dim mismatch (the joint space is shared across modalities by CLIP's
  construction, so one head serves both); it trains with the student and is
  stripped at export (:func:`strip_distill_params`).

Sharded form: student and teacher features all-gather over the ``data``
axis inside ``shard_map`` — the same ICI collective the global InfoNCE
rides — so every KD row sees the full global batch of columns.

TPU notes: the teacher forward is outside the differentiated closure (no
grads, no saved activations), runs at eval dtype, and its params enter the
jitted step as *arguments* (never closure constants — see CLAUDE.md on the
600 MB-literal trap).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from tapclip_tpu.config import CLIPConfig
from tapclip_tpu.models import clip as clip_model
from tapclip_tpu.parallel.mesh import DATA_AXIS
from tapclip_tpu.pretrain import contrastive_loss_local

Params = Dict


def init_distill_params(
    key: jax.Array,
    student_params: Params,
    student_embed_dim: int,
    teacher_embed_dim: int,
) -> Params:
    """Student param tree + the ``kd_proj`` head when embed dims differ.

    ``kd_proj`` is initialized near-orthogonal (scaled normal) so early
    feature-mimicry gradients are well-conditioned; when the dims match the
    student mimics the teacher directly and no head is added.
    """
    if student_embed_dim == teacher_embed_dim:
        return dict(student_params)
    w = jax.random.normal(
        key, (student_embed_dim, teacher_embed_dim), jnp.float32
    ) * (student_embed_dim ** -0.5)
    return dict(student_params, kd_proj=w)


def strip_distill_params(params: Params) -> Params:
    """Drop the distillation-only leaves before export — the saved student
    is a plain CLIP tree, loadable anywhere a pretrained checkpoint is."""
    return {k: v for k, v in params.items() if k != "kd_proj"}


def _kd_kl(t_logits: jnp.ndarray, s_logits: jnp.ndarray, tau: float) -> jnp.ndarray:
    """Mean row-wise KL(teacher || student) at temperature tau (x tau^2)."""
    t = jax.nn.log_softmax(t_logits / tau, axis=-1)
    s = jax.nn.log_softmax(s_logits / tau, axis=-1)
    return (tau * tau) * jnp.mean(jnp.sum(jnp.exp(t) * (t - s), axis=-1))


def _feat_mimic(s_e: jnp.ndarray, t_e: jnp.ndarray, kd_proj) -> jnp.ndarray:
    """1 - cos between (projected) student and teacher embeddings."""
    if kd_proj is not None:
        s_e = s_e @ kd_proj
    s_e = clip_model.l2_normalize(s_e)
    return 1.0 - jnp.mean(jnp.sum(s_e * t_e, axis=-1))


def distill_loss_local(
    s_img: jnp.ndarray,
    s_txt: jnp.ndarray,
    t_img: jnp.ndarray,
    t_txt: jnp.ndarray,
    s_scale: jnp.ndarray,
    t_scale: jnp.ndarray,
    kd_proj,
    *,
    tau: float = 1.0,
    w_task: float = 1.0,
    w_kd: float = 1.0,
    w_feat: float = 1.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Single-device distillation objective; all features UN-normalized in,
    normalized here (mirrors ``contrastive_loss_local``)."""
    si = clip_model.l2_normalize(s_img).astype(jnp.float32)
    st = clip_model.l2_normalize(s_txt).astype(jnp.float32)
    ti = clip_model.l2_normalize(t_img).astype(jnp.float32)
    tt = clip_model.l2_normalize(t_txt).astype(jnp.float32)

    task = contrastive_loss_local(s_img, s_txt, s_scale)

    s_logits = jnp.exp(s_scale) * si @ st.T
    t_logits = jnp.exp(t_scale) * ti @ tt.T
    kd = 0.5 * (_kd_kl(t_logits, s_logits, tau)
                + _kd_kl(t_logits.T, s_logits.T, tau))

    feat = 0.5 * (_feat_mimic(s_img.astype(jnp.float32), ti, kd_proj)
                  + _feat_mimic(s_txt.astype(jnp.float32), tt, kd_proj))

    total = w_task * task + w_kd * kd + w_feat * feat
    return total, {"task": task, "kd": kd, "feat": feat}


def distill_loss_global(
    s_img, s_txt, t_img, t_txt, s_scale, t_scale, kd_proj, mesh: Mesh,
    *, tau=1.0, w_task=1.0, w_kd=1.0, w_feat=1.0,
):
    """Global-batch distillation over a data-sharded mesh: local rows vs
    all-gathered columns for both the task InfoNCE and the KD KL (equal to
    the single-device loss on the gathered batch — tests/test_distill.py)."""

    def per_chip(s_img_l, s_txt_l, t_img_l, t_txt_l, ss, ts, proj):
        si = clip_model.l2_normalize(s_img_l).astype(jnp.float32)
        st = clip_model.l2_normalize(s_txt_l).astype(jnp.float32)
        ti = clip_model.l2_normalize(t_img_l).astype(jnp.float32)
        tt = clip_model.l2_normalize(t_txt_l).astype(jnp.float32)
        si_all = jax.lax.all_gather(si, DATA_AXIS, axis=0, tiled=True)
        st_all = jax.lax.all_gather(st, DATA_AXIS, axis=0, tiled=True)
        ti_all = jax.lax.all_gather(ti, DATA_AXIS, axis=0, tiled=True)
        tt_all = jax.lax.all_gather(tt, DATA_AXIS, axis=0, tiled=True)
        n_local = si.shape[0]
        offset = jax.lax.axis_index(DATA_AXIS) * n_local
        labels = offset + jnp.arange(n_local)

        # task InfoNCE: local rows vs global columns (both directions)
        sl_i = jnp.exp(ss) * si @ st_all.T
        sl_t = jnp.exp(ss) * st @ si_all.T
        task_sum = 0.5 * (
            optax.softmax_cross_entropy_with_integer_labels(sl_i, labels)
            + optax.softmax_cross_entropy_with_integer_labels(sl_t, labels)
        ).sum()

        # KD KL: local rows vs global columns, teacher and student aligned
        tl_i = jnp.exp(ts) * ti @ tt_all.T
        tl_t = jnp.exp(ts) * tt @ ti_all.T

        def kl_rowsum(t_lg, s_lg):
            t = jax.nn.log_softmax(t_lg / tau, axis=-1)
            s = jax.nn.log_softmax(s_lg / tau, axis=-1)
            return (tau * tau) * jnp.sum(jnp.exp(t) * (t - s))

        kd_sum = 0.5 * (kl_rowsum(tl_i, sl_i) + kl_rowsum(tl_t, sl_t))

        # feature mimicry is per-sample local
        def mimic_sum(s_e, t_e):
            if proj is not None:
                s_e = s_e @ proj
            s_e = clip_model.l2_normalize(s_e)
            return jnp.sum(1.0 - jnp.sum(s_e * t_e, axis=-1))

        feat_sum = 0.5 * (
            mimic_sum(s_img_l.astype(jnp.float32), ti)
            + mimic_sum(s_txt_l.astype(jnp.float32), tt)
        )

        n_global = jax.lax.psum(jnp.asarray(n_local, jnp.float32), DATA_AXIS)
        task = jax.lax.psum(task_sum, DATA_AXIS) / n_global
        kd = jax.lax.psum(kd_sum, DATA_AXIS) / n_global
        feat = jax.lax.psum(feat_sum, DATA_AXIS) / n_global
        total = w_task * task + w_kd * kd + w_feat * feat
        return total, task, kd, feat

    if kd_proj is None:
        # shard_map needs a concrete leaf; route the no-proj case through a
        # closure instead of a None argument.
        fn = shard_map(
            lambda a, b, c, d, e, f: per_chip(a, b, c, d, e, f, None),
            mesh=mesh,
            in_specs=(P(DATA_AXIS),) * 4 + (P(), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
        total, task, kd, feat = fn(s_img, s_txt, t_img, t_txt, s_scale, t_scale)
    else:
        fn = shard_map(
            per_chip,
            mesh=mesh,
            in_specs=(P(DATA_AXIS),) * 4 + (P(), P(), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
        total, task, kd, feat = fn(
            s_img, s_txt, t_img, t_txt, s_scale, t_scale, kd_proj
        )
    return total, {"task": task, "kd": kd, "feat": feat}


def make_distill_step(
    student_cfg: CLIPConfig,
    teacher_cfg: CLIPConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    *,
    tau: float = 1.0,
    w_task: float = 1.0,
    w_kd: float = 1.0,
    w_feat: float = 1.0,
) -> Callable:
    """Jitted distillation step: ``(student, teacher, opt_state, images,
    token_ids) -> (student, opt_state, metrics)``.

    The teacher runs forward-only (frozen, passed as an argument each step);
    gradients flow to the student tree — including its ``kd_proj`` head when
    present — and nowhere else.  With a mesh, both models' features gather
    over the ``data`` axis so the KD rows see global-batch columns.
    """

    def loss_fn(student, t_img, t_txt, t_scale, images, token_ids):
        s_img = clip_model.encode_image(student, student_cfg, images)
        s_txt = clip_model.encode_text(student, student_cfg, token_ids)
        kw = dict(tau=tau, w_task=w_task, w_kd=w_kd, w_feat=w_feat)
        kd_proj = student.get("kd_proj")
        if mesh is not None and mesh.shape.get(DATA_AXIS, 1) > 1:
            return distill_loss_global(
                s_img, s_txt, t_img, t_txt, student["logit_scale"],
                t_scale, kd_proj, mesh, **kw,
            )
        return distill_loss_local(
            s_img, s_txt, t_img, t_txt, student["logit_scale"],
            t_scale, kd_proj, **kw,
        )

    @functools.partial(jax.jit, donate_argnums=(0, 2))
    def step(student, teacher, opt_state, images, token_ids):
        # Teacher forward outside the grad closure: no cotangents, no saved
        # activations — XLA schedules it as a pure inference subgraph.
        t_img = jax.lax.stop_gradient(
            clip_model.encode_image(teacher, teacher_cfg, images)
        )
        t_txt = jax.lax.stop_gradient(
            clip_model.encode_text(teacher, teacher_cfg, token_ids)
        )
        t_scale = jax.lax.stop_gradient(teacher["logit_scale"])
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            student, t_img, t_txt, t_scale, images, token_ids
        )
        updates, opt_state = optimizer.update(grads, opt_state, student)
        student = optax.apply_updates(student, updates)
        student = dict(
            student,
            logit_scale=jnp.clip(student["logit_scale"], None, jnp.log(100.0)),
        )
        metrics = {"loss": loss, **parts}
        return student, opt_state, metrics

    return step
