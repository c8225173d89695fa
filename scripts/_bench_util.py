"""Shared slope-timing protocol for benchmarks on the tunneled TPU.

The hazards this encodes (see CLAUDE.md "Environment quirks"):
  * jax.block_until_ready can return early on the tunnel — even for
    NON-donated outputs (observed 0 ms "slope" for a ~30 ms forward) — so
    every chain drains through float() of a jitted scalar sum;
  * repeated (executable, args) pairs are relay-cacheable, so every
    dispatch must use a never-seen input: callers supply >= 3*steps+1
    distinct inputs (warm 1, chain-one `steps`, chain-two `2*steps`);
  * constants (readback RTT, dispatch overhead) cancel in the two-chain
    slope.
"""

import time

import jax
import jax.numpy as jnp

_SUM = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def drain(out) -> float:
    """Hard drain: scalar readback of the first leaf."""
    return float(_SUM(jax.tree.leaves(out)[0]))


def slope_time(fn, params, inputs, steps):
    """s/step of ``fn(params, x)`` via the two-chain slope protocol.

    ``params`` must be an ARGUMENT of fn, not a closure constant — a
    closed-over param tree is baked into the program as literals, and a
    600 MB upload trips the remote compile service's request limit.
    """
    assert len(inputs) >= 3 * steps + 1, "need 3*steps+1 distinct inputs"
    drain(fn(params, inputs[-1]))  # warm/compile

    def chain(n, off):
        t0 = time.perf_counter()
        o = None
        for i in range(n):
            o = fn(params, inputs[off + i])
        drain(o)
        return time.perf_counter() - t0

    t1 = chain(steps, 0)
    t2 = chain(2 * steps, steps)  # inputs[steps:3*steps] — no reuse
    return (t2 - t1) / steps


def slope_time_args(fn, args_list, steps):
    """Same protocol for ``fn(*args)`` call sites."""
    assert len(args_list) >= 3 * steps + 1, "need 3*steps+1 distinct inputs"
    drain(fn(*args_list[-1]))

    def chain(n, off):
        t0 = time.perf_counter()
        o = None
        for i in range(n):
            o = fn(*args_list[off + i])
        drain(o)
        return time.perf_counter() - t0

    t1 = chain(steps, 0)
    t2 = chain(2 * steps, steps)
    return (t2 - t1) / steps


# Shared A&S erf polynomials for the kernel A/B scripts.  The 5-term form
# IS the production polynomial — imported, not copied, so the scripts'
# "production-equivalent" arms can never drift from the shipped kernel.
# The 3-term variant is an A/B candidate only (max |err| 2.5e-5).
from tapclip_tpu.ops.fused_mlp import _erf_poly as erf5  # noqa: E402


def erf3(x):
    import jax.numpy as jnp

    a1, a2, a3 = 0.3480242, -0.0958798, 0.7478556
    p = 0.47047
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - ((a3 * t + a2) * t + a1) * t * jnp.exp(-ax * ax)
    return jnp.sign(x) * y
