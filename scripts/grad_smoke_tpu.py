"""Real-chip smoke for the Pallas backward kernels.

Runs grads through fused_mha / fused_attn_block / fused_attention at the
real model shapes (text tower W=512 H=8 Tp=128; vision W=768 H=12 Tp=200)
and checks them against the XLA oracle on-chip.  One jitted dispatch per
check; block once at the end (tunnel protocol, see CLAUDE.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tapclip_tpu.ops.attention import attention_reference
from tapclip_tpu.ops.flash_attention import fused_attention
from tapclip_tpu.ops.fused_mha import _attn_block_xla, _xla_reference, fused_attn_block, fused_mha


def check(name, got, want, rtol=2e-2, atol=2e-2):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = np.max(np.abs(got - want) / (np.abs(want) + 1e-3))
    ok = np.allclose(got, want, rtol=rtol, atol=atol)
    print(f"  {name}: max rel err {err:.2e} -> {'OK' if ok else 'FAIL'}")
    assert ok, name


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    key = jax.random.PRNGKey(0)

    # --- fused_mha grad, text-tower shape (bf16) -------------------------
    B, T, W, H = 16, 128, 512, 8
    qkv = jax.random.normal(key, (B, T, 3 * W), jnp.bfloat16)
    w = jax.random.normal(key, (B, T, W), jnp.bfloat16)

    gk = jax.jit(jax.grad(lambda x: jnp.sum((fused_mha(x, H, valid_len=82) * w).astype(jnp.float32))))(qkv)
    gr = jax.jit(jax.grad(lambda x: jnp.sum((_xla_reference(x, H, 82) * w).astype(jnp.float32))))(qkv)
    print("fused_mha bwd kernel (text shape, valid=82):")
    check("dqkv", gk, gr, rtol=5e-2, atol=5e-2)

    # --- fused_attn_block grad, vision shape (bf16) ----------------------
    B, T, W, H = 8, 200, 768, 12
    from tapclip_tpu.models.layers import init_attn, init_layer_norm

    x = jax.random.normal(key, (B, T, W), jnp.bfloat16)
    ln = init_layer_norm(W)
    attn = init_attn(jax.random.PRNGKey(1), W)
    wl = jax.random.normal(key, (B, T, W), jnp.bfloat16)

    def kloss(x):
        return jnp.sum((fused_attn_block(x, ln, attn, H, valid_len=197) * wl).astype(jnp.float32))

    def rloss(x):
        out = _attn_block_xla(
            x, ln["scale"], ln["bias"], attn["w_qkv"], attn["b_qkv"],
            attn["w_out"], attn["b_out"], H, 197, 1e-5,
        )
        return jnp.sum((out * wl).astype(jnp.float32))

    gk = jax.jit(jax.grad(kloss))(x)
    gr = jax.jit(jax.grad(rloss))(x)
    print("fused_attn_block bwd (vision shape, valid=197):")
    check("dx", gk, gr, rtol=8e-2, atol=8e-2)

    # --- fused_attention (flash core) grad with aux + causal -------------
    B, H, T, Dh = 8, 8, 82, 64
    q = jax.random.normal(key, (B, H, T, Dh), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(2), (B, H, T, Dh), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(3), (B, H, T, Dh), jnp.bfloat16)
    valid = jnp.full((B,), 77, jnp.int32)
    eot = jnp.full((B,), 60, jnp.int32)
    wq = jax.random.normal(key, (B, H, T, Dh), jnp.bfloat16)

    def kloss2(q, k, v):
        out, _ = fused_attention(q, k, v, causal=True, kv_valid_len=valid, attn_to_idx=eot)
        return jnp.sum((out * wq).astype(jnp.float32))

    def rloss2(q, k, v):
        out, _ = attention_reference(q, k, v, causal=True, kv_valid_len=valid)
        return jnp.sum((out * wq).astype(jnp.float32))

    gk = jax.jit(jax.grad(kloss2, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(rloss2, argnums=(0, 1, 2)))(q, k, v)
    print("fused_attention bwd kernel (causal + per-batch valid + aux):")
    for n, a, b in zip(("dq", "dk", "dv"), gk, gr):
        check(n, a, b, rtol=8e-2, atol=8e-2)

    # --- fused_mlp_block dedicated bwd kernel, vision shape (bf16) --------
    from tapclip_tpu.models.layers import init_mlp
    from tapclip_tpu.ops.fused_mlp import _xla_composition, fused_mlp_block

    # R = B·T must be a row_tile (256) multiple or fused_mlp_block falls back
    # to XLA and the kernel is never exercised: B=32, T=200 -> R=6400.
    B, T, W = 32, 200, 768
    x = jax.random.normal(jax.random.PRNGKey(4), (B, T, W), jnp.bfloat16)
    ln2 = init_layer_norm(W)
    mlp = init_mlp(jax.random.PRNGKey(5), W, 4 * W)
    wm = jax.random.normal(key, (B, T, W), jnp.bfloat16)

    def kloss3(x, wf, wp):
        m = dict(mlp, w_fc=wf, w_proj=wp)
        return jnp.sum((fused_mlp_block(x, ln2, m) * wm).astype(jnp.float32))

    def rloss3(x, wf, wp):
        out = _xla_composition(x, ln2["scale"], ln2["bias"], wf, mlp["b_fc"],
                               wp, mlp["b_proj"], 1e-5)
        return jnp.sum((out * wm).astype(jnp.float32))

    gk = jax.jit(jax.grad(kloss3, argnums=(0, 1, 2)))(x, mlp["w_fc"], mlp["w_proj"])
    gr = jax.jit(jax.grad(rloss3, argnums=(0, 1, 2)))(x, mlp["w_fc"], mlp["w_proj"])
    print("fused_mlp_block dedicated bwd kernel (vision shape):")
    # Weight grads are R=6400-row accumulated sums: elementwise atol is the
    # wrong metric (bf16-input noise is ~0.5% of the TENSOR magnitude while
    # individual entries cross zero). Compare against the tensor scale.
    for n, a, b in zip(("dx", "dw_fc", "dw_proj"), gk, gr):
        a32 = np.asarray(a, np.float32)
        b32 = np.asarray(b, np.float32)
        scale_err = np.max(np.abs(a32 - b32)) / max(np.max(np.abs(b32)), 1e-6)
        print(f"  {n}: max err / tensor scale {scale_err:.2e} -> "
              f"{'OK' if scale_err < 2e-2 else 'FAIL'}")
        assert scale_err < 2e-2, n

    print("ALL GRAD SMOKE CHECKS PASSED on", jax.devices()[0].device_kind)


if __name__ == "__main__":
    main()
