"""Chained-executable timing for the axon TPU tunnel.

``jax.block_until_ready`` is unreliable through the tunnel (BASELINE.md:25-27):
it can return before the device finishes. The robust method is to chain N
model iterations *inside one jitted executable* (each iteration's input
depends on the previous output, so XLA cannot parallelize them away) and read
back ONE scalar, which forces a full device->host sync. Per-iteration time is
then (t(N2) - t(N1)) / (N2 - N1), cancelling the constant per-dispatch
overhead (~30 ms through the tunnel).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax import lax


def make_chained(fn, n_iters: int):
    """Return jitted g(*args) that runs ``fn(*args)`` ``n_iters`` times, each
    iteration perturbing the first array arg by a value derived from the
    previous output (serializing the chain), and returns a f32 scalar."""

    @functools.partial(jax.jit, static_argnums=())
    def g(*args):
        first, rest = args[0], args[1:]

        def body(carry, _):
            x = first + carry.astype(first.dtype)
            out = fn(x, *rest)
            leaves = jax.tree.leaves(out)
            # Sum ALL elements: a sliced readback would let XLA dead-code-
            # eliminate everything outside the slice's cone (measured: the
            # 49-tap correlation "ran" in 0.14 ms because only pixel (0,0)
            # survived DCE).
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return s * jnp.float32(1e-30), None

        s, _ = lax.scan(body, jnp.float32(0.0), None, length=n_iters)
        return s

    return g


def chained_time(fn, args, n_lo: int = 2, n_hi: int = 10, reps: int = 3):
    """Per-iteration seconds of ``fn(*args)`` via the chained method.

    fn: positional-arg jittable callable; args: example arrays.
    """
    g_lo = make_chained(fn, n_lo)
    g_hi = make_chained(fn, n_hi)
    float(g_lo(*args))  # compile
    float(g_hi(*args))

    def run(g):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(g(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = run(g_lo), run(g_hi)
    return (t_hi - t_lo) / (n_hi - n_lo)
