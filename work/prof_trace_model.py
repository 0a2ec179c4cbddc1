"""Device-timeline profile of the full forward via jax.profiler (works
through the axon tunnel — r4g discovery, work/trace_probe.log).

Prints the top device ops by total time and category rollups (conv, gather,
copy, fusion, idle-gap) for one forward execution — the tool the r3/r4
"in-model conv scheduling loss" question was missing: ablation deltas show
WHAT costs, the timeline shows WHERE (op bloat vs inter-op gaps).

Usage: python -u work/prof_trace_model.py [version] [batch] [size] [n_exec]
"""

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/work")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from piv_liteflownet_tpu.models.factory import piv_liteflownet
from piv_liteflownet_tpu.models.liteflownet import forward

VERSION = int(sys.argv[1]) if len(sys.argv) > 1 else 1
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 4
SIZE = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
NEXEC = int(sys.argv[4]) if len(sys.argv) > 4 else 3
OUTDIR = f"/root/repo/work/trace_v{VERSION}_{SIZE}_b{BATCH}"

model = piv_liteflownet(version=VERSION)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params)
key = jax.random.PRNGKey(0)
img1 = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.bfloat16)
img2 = jax.random.uniform(jax.random.fold_in(key, 1),
                          (BATCH, SIZE, SIZE, 3), jnp.bfloat16)

fn = jax.jit(lambda a, b: forward(params, a, b, model.cfg, train=False))
out = fn(img1, img2)
print("warm:", float(out.reshape(-1)[0]), flush=True)

with jax.profiler.trace(OUTDIR):
    for _ in range(NEXEC):
        float(fn(img1, img2).reshape(-1)[0])

traces = sorted(glob.glob(os.path.join(OUTDIR, "plugins/profile/*/*.trace.json.gz")))
assert traces, f"no trace under {OUTDIR}"
with gzip.open(traces[-1]) as f:
    t = json.load(f)

dev_pids = {e["pid"] for e in t["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "TPU" in e["args"].get("name", "")}
ev = [e for e in t["traceEvents"]
      if e.get("ph") == "X" and e.get("pid") in dev_pids]
print(f"device events: {len(ev)} (pids {sorted(dev_pids)})", flush=True)

# Module-level lane (the jit_ execution span) vs op lane
top = [e for e in ev if e["name"].startswith("jit_")]
ops = [e for e in ev if not e["name"].startswith("jit_")]
span = sum(e["dur"] for e in top) / max(1, len(top))
busy = sum(e["dur"] for e in ops) / max(1, NEXEC)
print(f"per-exec span {span/1e3:.2f} ms, op-busy {busy/1e3:.2f} ms, "
      f"gap {(span - busy)/1e3:.2f} ms", flush=True)

agg = collections.Counter()
cnt = collections.Counter()
for e in ops:
    agg[e["name"]] += e["dur"]
    cnt[e["name"]] += 1

CATS = ("convolution", "fusion", "copy", "gather", "scatter", "dynamic",
        "reduce", "transpose", "dot", "concatenate", "slice", "select",
        "broadcast", "iota", "pad", "convert", "bitcast")


def cat(name):
    for c in CATS:
        if c in name:
            return c
    return "other"


bycat = collections.Counter()
for name, d in agg.items():
    bycat[cat(name)] += d
print("\n-- category rollup (ms per exec) --", flush=True)
for c, d in bycat.most_common():
    print(f"  {c:<14s} {d/1e3/NEXEC:8.2f}", flush=True)

print("\n-- top 45 ops by total device time --", flush=True)
for name, d in agg.most_common(45):
    print(f"  {d/1e3/NEXEC:8.3f} ms  x{cnt[name]//NEXEC:<4d} {name[:90]}",
          flush=True)
