"""Knowledge-distillation tests (tapclip_tpu/distill.py).

Pins: self-distillation is exactly zero (KL and mimicry both vanish when
student == teacher), the student actually learns to mimic a different
teacher, the kd_proj head bridges an embed-dim mismatch (and is stripped at
export), and the sharded global-batch loss equals the local one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tapclip_tpu.distill import (
    distill_loss_global,
    distill_loss_local,
    init_distill_params,
    make_distill_step,
    strip_distill_params,
)
from tapclip_tpu.models import clip as C
from tapclip_tpu.parallel.mesh import make_mesh
from tapclip_tpu.parallel.sharding import replicate, shard_batch, shard_params


def _batch(cfg, rng, B=16):
    images = jnp.asarray(
        rng.standard_normal((B, cfg.image_size, cfg.image_size, 3)),
        jnp.float32,
    )
    ids = jnp.asarray(
        rng.integers(1, cfg.vocab_size - 2, (B, cfg.context_length)), jnp.int32
    )
    return images, ids


def _feats(params, cfg, images, ids):
    return (
        C.encode_image(params, cfg, images),
        C.encode_text(params, cfg, ids),
        params["logit_scale"],
    )


def test_self_distillation_is_zero(tiny_cfg, tiny_params, rng):
    images, ids = _batch(tiny_cfg, rng)
    img, txt, scale = _feats(tiny_params, tiny_cfg, images, ids)
    total, parts = distill_loss_local(
        img, txt, img, txt, scale, scale, None, w_task=0.0
    )
    assert float(parts["kd"]) < 1e-9
    assert float(parts["feat"]) < 1e-6
    assert float(total) < 1e-6


def test_student_learns_teacher(tiny_cfg, tiny_params, rng):
    """30 distillation steps on a fixed batch: total loss drops sharply and
    the KD term (teacher-structure transfer) specifically improves."""
    teacher = tiny_params
    student = C.init_clip_params(jax.random.PRNGKey(42), tiny_cfg)
    opt = optax.adam(5e-3)
    step = make_distill_step(tiny_cfg, tiny_cfg, opt, w_task=0.5)
    opt_state = opt.init(student)
    images, ids = _batch(tiny_cfg, rng)
    first = None
    for i in range(30):
        student, opt_state, m = step(student, teacher, opt_state, images, ids)
        if first is None:
            first = {k: float(v) for k, v in m.items()}
    last = {k: float(v) for k, v in m.items()}
    assert last["loss"] < 0.5 * first["loss"]
    assert last["kd"] < first["kd"]
    assert last["feat"] < first["feat"]


def test_kd_proj_bridges_dim_mismatch(tiny_cfg, tiny_params, rng):
    t_cfg = tiny_cfg.replace(embed_dim=48)
    teacher = C.init_clip_params(jax.random.PRNGKey(7), t_cfg)
    student = init_distill_params(
        jax.random.PRNGKey(8),
        C.init_clip_params(jax.random.PRNGKey(9), tiny_cfg),
        tiny_cfg.embed_dim,
        t_cfg.embed_dim,
    )
    assert student["kd_proj"].shape == (tiny_cfg.embed_dim, t_cfg.embed_dim)
    opt = optax.adam(5e-3)
    step = make_distill_step(tiny_cfg, t_cfg, opt)
    opt_state = opt.init(student)
    images, ids = _batch(tiny_cfg, rng)
    proj0 = np.asarray(student["kd_proj"])
    for _ in range(3):
        student, opt_state, m = step(student, teacher, opt_state, images, ids)
    assert np.isfinite(float(m["loss"]))
    # the head is trained (mimicry gradients reach it) ...
    assert np.abs(np.asarray(student["kd_proj"]) - proj0).max() > 1e-6
    # ... and stripped at export
    exported = strip_distill_params(student)
    assert "kd_proj" not in exported
    assert set(exported) == set(C.init_clip_params(jax.random.PRNGKey(0), tiny_cfg))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_global_loss_matches_local(tiny_cfg, tiny_params, rng):
    images, ids = _batch(tiny_cfg, rng)
    teacher = tiny_params
    student = C.init_clip_params(jax.random.PRNGKey(3), tiny_cfg)
    s_img, s_txt, ss = _feats(student, tiny_cfg, images, ids)
    t_img, t_txt, ts = _feats(teacher, tiny_cfg, images, ids)
    total_l, parts_l = distill_loss_local(
        s_img, s_txt, t_img, t_txt, ss, ts, None, tau=2.0
    )
    mesh = make_mesh(dp=8, tp=1)
    with mesh:
        sh = lambda t: shard_batch(t, mesh)
        total_g, parts_g = distill_loss_global(
            sh(s_img), sh(s_txt), sh(t_img), sh(t_txt), ss, ts, None,
            mesh, tau=2.0,
        )
    np.testing.assert_allclose(float(total_l), float(total_g), rtol=1e-5)
    for k in parts_l:
        np.testing.assert_allclose(
            float(parts_l[k]), float(parts_g[k]), rtol=1e-5, atol=1e-7
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_distill_step(tiny_cfg, tiny_params, rng):
    mesh = make_mesh(dp=8, tp=1)
    teacher = tiny_params
    student = C.init_clip_params(jax.random.PRNGKey(3), tiny_cfg)
    opt = optax.adam(1e-3)
    step = make_distill_step(tiny_cfg, tiny_cfg, opt, mesh=mesh)
    images, ids = _batch(tiny_cfg, rng)
    with mesh:
        student_d = shard_params(student, mesh)
        teacher_d = shard_params(teacher, mesh)
        opt_state = replicate(opt.init(student), mesh)
        images_d, ids_d = shard_batch((images, ids), mesh)
        student_d, opt_state, m = step(
            student_d, teacher_d, opt_state, images_d, ids_d
        )
        student_d, opt_state, m2 = step(
            student_d, teacher_d, opt_state, images_d, ids_d
        )
    assert np.isfinite(float(m2["loss"]))
    assert float(m2["loss"]) < float(m["loss"])
