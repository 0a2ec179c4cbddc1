"""Full layout-copy census of the optimized HLO for the jitted forward.

Parses EVERY copy instruction (plus standalone transpose/pad) out of the
optimized module, with its shape, byte size, the Mosaic cost model's
estimated_cycles from backend_config, its producer op-kind, and its
consumers. Ranks by estimated cycles and totals the bill, so the layout-copy
attack (ROUND4_NOTES "HLO-mapping probe") works from the complete record
rather than hand-picked trace names.

Usage: python -u work/prof_copy_census.py [version] [batch] [size] [top_n]
"""

import json
import re
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from piv_liteflownet_tpu.models.factory import piv_liteflownet
from piv_liteflownet_tpu.models.liteflownet import forward

VERSION = int(sys.argv[1]) if len(sys.argv) > 1 else 1
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 4
SIZE = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
TOP_N = int(sys.argv[4]) if len(sys.argv) > 4 else 30
CLOCK_GHZ = 0.94  # v5e TensorCore

model = piv_liteflownet(version=VERSION)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params)
key = jax.random.PRNGKey(0)
img1 = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.bfloat16)
img2 = jax.random.uniform(jax.random.fold_in(key, 1),
                          (BATCH, SIZE, SIZE, 3), jnp.bfloat16)

fn = jax.jit(lambda a, b: forward(params, a, b, model.cfg, train=False))
txt = fn.lower(img1, img2).compile().as_text()
print(f"HLO text: {len(txt)} chars", flush=True)
lines = txt.splitlines()

DTYPE_BYTES = {"bf16": 2, "f32": 4, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
               "u8": 1, "pred": 1, "s16": 2, "u16": 2, "f64": 8, "s64": 8}

inst_re = re.compile(r"^\s*(?:ROOT )?%?([\w.\-]+) = ([\w\[\]{},:()\d]+) ([\w\-]+)\(")
shape_re = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(type_str):
    total = 0
    for m in shape_re.finditer(type_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


# Pass 1: all instruction defs (name -> (line_idx, type_str, op)), and which
# computation each line belongs to (fusion bodies vs entry/while bodies).
defs = {}
for i, ln in enumerate(lines):
    m = inst_re.match(ln)
    if m:
        defs[m.group(1)] = (i, m.group(2), m.group(3))

# Pass 2: consumers — every def line that references %name as an operand.
consumers = defaultdict(list)
oper_re = re.compile(r"%([\w.\-]+)")
for name, (i, _, op) in defs.items():
    ln = lines[i]
    # strip the lhs
    rhs = ln.split(" = ", 1)[1] if " = " in ln else ln
    # only the operand list (before metadata/backend_config)
    paren = rhs.find("(")
    end = rhs.find("), ")
    seg = rhs[paren + 1 : end if end > 0 else None]
    for m2 in oper_re.finditer(seg):
        if m2.group(1) != name:
            consumers[m2.group(1)].append((name, op))

cyc_re = re.compile(r'"estimated_cycles":"(\d+)"')
src_re = re.compile(r'source_file="([^"]+)" source_line=(\d+)')

rows = []
total_copy_cycles = 0
total_copy_bytes = 0
by_source = defaultdict(lambda: [0, 0])  # src -> [cycles, count]
for name, (i, type_str, op) in defs.items():
    if op != "copy":
        continue
    ln = lines[i]
    mcyc = cyc_re.search(ln)
    cyc = int(mcyc.group(1)) if mcyc else 0
    nbytes = shape_bytes(type_str)
    msrc = src_re.search(ln)
    src = (msrc.group(1).split("/")[-1] + ":" + msrc.group(2)) if msrc else "?"
    # producer op kind
    rhs = ln.split(" = ", 1)[1]
    mprod = re.search(r"copy\(%([\w.\-]+)\)", rhs)
    prod = mprod.group(1) if mprod else "?"
    prod_op = defs.get(prod, (0, "", "?"))[2]
    cons = consumers.get(name, [])[:3]
    total_copy_cycles += cyc
    total_copy_bytes += nbytes
    by_source[src][0] += cyc
    by_source[src][1] += 1
    rows.append((cyc, nbytes, name, type_str[:64], src, prod, prod_op,
                 [c[0] + ":" + c[1] for c in cons]))

rows.sort(reverse=True)
print(f"\n== {len(rows)} copies, total est "
      f"{total_copy_cycles / CLOCK_GHZ / 1e6:.2f} ms "
      f"({total_copy_bytes / 1e9:.2f} GB out-bytes) ==", flush=True)
print(f"{'ms':>7} {'MB':>7}  name / shape / src / producer -> consumers")
for cyc, nbytes, name, tstr, src, prod, prod_op, cons in rows[:TOP_N]:
    print(f"{cyc / CLOCK_GHZ / 1e6:7.3f} {nbytes / 1e6:7.1f}  {name}  {tstr}")
    print(f"{'':16} src={src}  prod={prod}({prod_op})  cons={cons}")

print("\n== by source line ==", flush=True)
for src, (cyc, cnt) in sorted(by_source.items(), key=lambda x: -x[1][0])[:20]:
    print(f"{cyc / CLOCK_GHZ / 1e6:8.3f} ms  x{cnt:<4} {src}")

# also total the pads and standalone transposes for context
for kind in ("pad", "transpose"):
    tc = sum(int(cyc_re.search(lines[i]).group(1))
             for name, (i, t, op) in defs.items()
             if op == kind and cyc_re.search(lines[i]))
    print(f"total {kind} est: {tc / CLOCK_GHZ / 1e6:.2f} ms", flush=True)

print(json.dumps({"version": VERSION, "batch": BATCH, "size": SIZE,
                  "n_copies": len(rows),
                  "copy_ms_est": round(total_copy_cycles / CLOCK_GHZ / 1e6, 2),
                  "copy_gb": round(total_copy_bytes / 1e9, 3)}), flush=True)
