"""Device-honest timing for TPU benchmarks.

``jax.block_until_ready`` is unreliable through the axon tunnel (it can
return before the device finishes; BASELINE.md), so throughput numbers use
the *chained-executable* method:

1. N iterations of the measured function run inside ONE jitted executable,
   each iteration's input perturbed by a scalar derived from the previous
   output — the chain serializes on device and cannot be parallelized or
   dead-code-eliminated by XLA;
2. the executable returns one f32 scalar that sums ALL output elements
   (a sliced readback would let XLA DCE everything outside the slice's
   dependency cone — measured: a 49-tap correlation "ran" in 0.14 ms because
   only pixel (0,0) survived);
3. reading that scalar to host forces a full device sync;
4. per-iteration time is (t(N_hi) - t(N_lo)) / (N_hi - N_lo), cancelling the
   constant per-dispatch overhead (~30 ms through the tunnel).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax import lax


def make_chained(fn, n_iters: int, compiler_options=None, example_args=None):
    """Jitted g(*args): run ``fn(*args)`` ``n_iters`` times serially on device,
    returning one f32 scalar (see module docstring).

    ``compiler_options`` (dict) is forwarded per-compile to the backend XLA
    compiler — on this rig that is the only route that reaches the remote TPU
    compiler (env XLA_FLAGS with ``xla_tpu_*`` names crashes the local CPU
    jaxlib flag parser; r4 battery). Requires ``example_args`` for AOT
    lower+compile.
    """

    @jax.jit
    def g(*args):
        first, rest = args[0], args[1:]

        def body(carry, _):
            x = first + carry.astype(first.dtype)
            out = fn(x, *rest)
            leaves = jax.tree.leaves(out)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return s * jnp.float32(1e-30), None

        s, _ = lax.scan(body, jnp.float32(0.0), None, length=n_iters)
        return s

    if compiler_options:
        return jax.jit(g.__wrapped__).lower(*example_args).compile(
            compiler_options=compiler_options)
    return g


def chained_time(fn, args, n_lo: int = 2, n_hi: int = 6, reps: int = 3,
                 compiler_options=None) -> float:
    """Per-iteration seconds of ``fn(*args)``, dispatch overhead excluded.

    For fast ops the ~30 ms tunnel dispatch jitter can swallow a short
    chain-length difference; instead of reporting an absurd figure (or
    aborting a whole profiling battery), escalate ``n_hi`` until the delta
    rises cleanly above the jitter floor.
    """
    g_lo = make_chained(fn, n_lo, compiler_options, args)
    float(g_lo(*args))  # compile + warm

    def run(g):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(g(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = run(g_lo)
    for nh in (n_hi, 4 * n_hi, 16 * n_hi, 64 * n_hi):
        g_hi = make_chained(fn, nh, compiler_options, args)
        float(g_hi(*args))
        t_hi = run(g_hi)
        dt = t_hi - t_lo
        if dt > max(1e-6, 0.15 * t_lo):
            return dt / (nh - n_lo)
    # Even a 64x chain didn't separate from the jitter floor — a clamped
    # value would silently report an absurd throughput figure.
    raise RuntimeError(
        f"chained_time: t(n={nh})={t_hi:.4f}s ~ t(n={n_lo})={t_lo:.4f}s "
        "(dispatch jitter dominates even at 64x chain length)"
    )
