"""Does jax.profiler produce a device trace through the axon tunnel?

If yes, the VERDICT-#3 conv-scheduling study can use real timelines instead
of ablation deltas. If no, record that and stay with ablations.

Usage: python -u work/prof_trace_probe.py > log 2>&1
"""

import glob
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

x = jnp.ones((1024, 1024), jnp.bfloat16)
f = jax.jit(lambda a: (a @ a).sum())
print("warm:", float(f(x)), flush=True)

try:
    with jax.profiler.trace("/root/repo/work/trace_probe"):
        for _ in range(3):
            out = float(f(x))
    files = glob.glob("/root/repo/work/trace_probe/**/*", recursive=True)
    print(f"trace files: {len(files)}", flush=True)
    for p in files[:20]:
        print("  ", p, flush=True)
    xp = [p for p in files if p.endswith(".xplane.pb")]
    print("XPLANE_PRESENT" if xp else "NO_XPLANE", flush=True)
except Exception as e:
    print("TRACE_FAILED:", repr(e)[:500], flush=True)
