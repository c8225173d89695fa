"""Real-chip smoke for the blockwise FA2-style attention backward.

Interpret mode does not enforce Mosaic tiling/alignment rules, so the three
long-sequence backward kernels (_blocked_lse_kernel, _blocked_bwd_dkv_kernel,
_blocked_bwd_dq_kernel) must compile AND match XLA autodiff on hardware.

Usage: python scripts/blocked_bwd_smoke_tpu.py [T=2560] [B=2] [H=4] [Dh=64]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tapclip_tpu.ops.attention import attention_reference
from tapclip_tpu.ops.flash_attention import fused_attention


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 2560
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    Dh = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    print(f"backend={jax.default_backend()} B={B} H={H} T={T} Dh={Dh}")
    assert jax.default_backend() == "tpu", "this smoke must run on hardware"

    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    shape = (B, H, T, Dh)
    q, k, v, g = (jax.random.normal(kk, shape, jnp.float32) for kk in keys)
    valid = jnp.asarray([T] + [max(T - 531, 1)] * (B - 1), jnp.int32)

    for causal in (False, True):
        def pallas_loss(q_, k_, v_):
            out, _ = fused_attention(q_, k_, v_, causal=causal, kv_valid_len=valid)
            return jnp.vdot(out, g)

        def xla_loss(q_, k_, v_):
            out, _ = attention_reference(q_, k_, v_, causal=causal, kv_valid_len=valid)
            return jnp.vdot(out, g)

        t0 = time.perf_counter()
        gp = jax.jit(jax.grad(pallas_loss, argnums=(0, 1, 2)))(q, k, v)
        jax.block_until_ready(gp)
        t1 = time.perf_counter()
        gr = jax.jit(jax.grad(xla_loss, argnums=(0, 1, 2)))(q, k, v)
        jax.block_until_ready(gr)
        for name, a, b in zip(("dq", "dk", "dv"), gp, gr):
            a, b = np.asarray(a), np.asarray(b)
            rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
            print(f"  causal={causal} {name}: rel {rel:.2e}")
            assert rel < 5e-3, (name, rel)
        print(f"  causal={causal}: kernel grad {t1-t0:.1f}s (incl. compile)")

    print("BLOCKED BWD SMOKE PASSED on", jax.devices()[0].device_kind)


if __name__ == "__main__":
    main()
