"""Categorized device-time bill of the training step (256^2 b8 bf16).

r4 finding: the 'Steps'/'XLA Modules' trace rows show the device takes
~157 ms per train step (3 x 157 = 471 ms of module time over 3 traced
steps) — the earlier '52.56 ms span' was an average over 9 module events
including 6 tiny readback modules. The wall is real compute. This script
maps every XLA-Ops trace event to source files via the optimized-HLO
metadata (fusions attributed proportionally to the source_file counts in
their fused computation) and prints ms/step per bucket.

Usage: python -u work/prof_train_bill.py > work/train_bill.log 2>&1
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from piv_liteflownet_tpu.data.transforms import Photometric, Pipeline
from piv_liteflownet_tpu.models.factory import piv_liteflownet
from piv_liteflownet_tpu.parallel.train_step import TrainState, make_train_step
from piv_liteflownet_tpu.training.loss import piv_loss
from piv_liteflownet_tpu.training.optim import make_optimizer

SIZE, BATCH, NEXEC = 256, 8, 3
OUTDIR = "/root/repo/work/trace_train_bill"

model = piv_liteflownet(version=1)
tx, _ = make_optimizer(model.params, model.cfg.lowest_level)
pipe = Pipeline(
    crop_size=(SIZE, SIZE), translate=16, scale_range=(0.95, 1.45),
    hflip=True, vflip=True,
    photometric=Photometric((0.0, 0.04), (-0.8, 0.4), 0.2, (0.5, 2.0), (0.7, 1.5)),
)
step = make_train_step(model.cfg, piv_loss(version=1), tx,
                       pipeline=pipe, compute_dtype=jnp.bfloat16)

key = jax.random.PRNGKey(0)
H = W = int(SIZE * 1.5)
img1 = jax.random.uniform(key, (BATCH, H, W, 3), jnp.float32)
img2 = jax.random.uniform(jax.random.fold_in(key, 1), (BATCH, H, W, 3), jnp.float32)
target = jax.random.normal(jax.random.fold_in(key, 2), (BATCH, H, W, 2), jnp.float32)

# ---- HLO name -> source attribution ---------------------------------------
# make_train_step returns a jitted callable; lower it directly
jstep = step
state0 = TrainState(jax.tree.map(jnp.array, model.params),
                    tx.init(model.params), jnp.zeros((), jnp.int32))
compiled = jstep.lower(state0, img1, img2, target,
                       jax.random.PRNGKey(7)).compile()
txt = compiled.as_text()
print(f"HLO text: {len(txt)} chars", flush=True)

# Build: instr name -> {source_file: count} (fusions: aggregate over their
# fused computation bodies).
lines = txt.splitlines()
SRC = re.compile(r'source_file="([^"]+)"')
DEF = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=")
CALLS = re.compile(r"(?:calls|to_apply)=%?([\w.\-]+)")

# computation name -> {file: count}
comp_files = collections.defaultdict(collections.Counter)
# computation name -> list of called computations
comp_calls = collections.defaultdict(list)
cur = None
for ln in lines:
    m = re.match(r"^\s*%?([\w.\-]+)\s*\([^)]*\)\s*->.*{", ln)
    if (ln.startswith("ENTRY") or m) and "{" in ln:
        cur = m.group(1) if m else "ENTRY"
    if cur is None:
        continue
    for sf in SRC.findall(ln):
        comp_files[cur][os.path.basename(sf)] += 1
    cm = CALLS.search(ln)
    if cm:
        comp_calls[cur].append(cm.group(1))

# instr name -> files (from its own line + called computation bodies)
instr_files = {}
cur = None
for ln in lines:
    m = re.match(r"^\s*%?([\w.\-]+)\s*\([^)]*\)\s*->.*{", ln)
    if (ln.startswith("ENTRY") or m) and "{" in ln:
        cur = m.group(1) if m else "ENTRY"
        continue
    dm = DEF.match(ln)
    if not dm:
        continue
    name = dm.group(1)
    files = collections.Counter(
        {os.path.basename(f): c for f, c in
         ((sf, 1) for sf in SRC.findall(ln))})
    cm = CALLS.search(ln)
    if cm:
        seen, stack = set(), [cm.group(1)]
        while stack:
            c = stack.pop()
            if c in seen:
                continue
            seen.add(c)
            files.update(comp_files.get(c, {}))
            stack.extend(comp_calls.get(c, []))
    if files:
        instr_files[name] = files
print(f"instructions with source attribution: {len(instr_files)}", flush=True)

# ---- trace -----------------------------------------------------------------
state = state0
state, m = jstep(state, img1, img2, target, jax.random.PRNGKey(7))
print("warm loss:", float(m["loss"]), flush=True)
with jax.profiler.trace(OUTDIR):
    for i in range(NEXEC):
        state, m = jstep(state, img1, img2, target, jax.random.fold_in(key, i))
        float(m["loss"])

traces = sorted(glob.glob(os.path.join(OUTDIR, "plugins/profile/*/*.trace.json.gz")))
with gzip.open(traces[-1]) as f:
    t = json.load(f)
ev = t["traceEvents"]
procs, threads = {}, collections.defaultdict(dict)
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        procs[e["pid"]] = e["args"].get("name", "")
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        threads[e["pid"]][e.get("tid")] = e["args"].get("name", "")
dev_pid = next(p for p, n in procs.items() if "TPU" in n)
ops_tid = next(t_ for t_, n in threads[dev_pid].items() if n == "XLA Ops")
mod_tid = next(t_ for t_, n in threads[dev_pid].items() if n == "XLA Modules")

mods = [e for e in ev if e.get("ph") == "X" and e.get("pid") == dev_pid
        and e.get("tid") == mod_tid]
big = sorted((e["dur"] for e in mods), reverse=True)[:NEXEC]
print(f"train-step module execs: {[round(d/1e3,1) for d in big]} ms", flush=True)

ops = [e for e in ev if e.get("ph") == "X" and e.get("pid") == dev_pid
       and e.get("tid") == ops_tid]
bill = collections.Counter()
unattr = collections.Counter()
for e in ops:
    name = e["name"]
    files = instr_files.get(name)
    if not files:
        unattr[re.sub(r"[.\d]+$", "", name)] += e["dur"]
        bill["(unattributed)"] += e["dur"]
        continue
    tot = sum(files.values())
    for f, c in files.items():
        bill[f] += e["dur"] * c / tot

print(f"\n-- device ms/step by source file (total "
      f"{sum(bill.values())/1e3/NEXEC:.1f}) --", flush=True)
for f, d in bill.most_common(25):
    print(f"  {d/1e3/NEXEC:8.2f} ms  {f}", flush=True)
print("\n-- unattributed op families --", flush=True)
for n, d in unattr.most_common(12):
    print(f"  {d/1e3/NEXEC:8.2f} ms  {n}", flush=True)

# line-level detail for the top model files
want = {"liteflownet.py", "nn.py", "warp.py", "transforms.py",
        "correlation.py", "train_step.py", "optim.py", "loss.py"}
bill2 = collections.Counter()
SRCL = re.compile(r'source_file="([^"]+)" source_line=(\d+)')
instr_lines = {}
cur = None
for ln in lines:
    m = re.match(r"^\s*%?([\w.\-]+)\s*\([^)]*\)\s*->.*{", ln)
    if (ln.startswith("ENTRY") or m) and "{" in ln:
        cur = m.group(1) if m else "ENTRY"
        continue
    dm = DEF.match(ln)
    if not dm:
        continue
    fl = collections.Counter(f"{os.path.basename(f)}:{l}"
                             for f, l in SRCL.findall(ln))
    cm = CALLS.search(ln)
    if cm and cm.group(1) in comp_files:
        pass  # file-level only for called bodies (line mix too noisy)
    if fl:
        instr_lines[dm.group(1)] = fl
for e in ops:
    fl = instr_lines.get(e["name"])
    if not fl:
        continue
    tot = sum(fl.values())
    for k, c in fl.items():
        if k.split(":")[0] in want:
            bill2[k] += e["dur"] * c / tot
print("\n-- hot source lines (own-line metadata only) --", flush=True)
for k, d in bill2.most_common(30):
    print(f"  {d/1e3/NEXEC:8.2f} ms  {k}", flush=True)
