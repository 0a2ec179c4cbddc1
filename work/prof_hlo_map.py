"""Map the hot trace ops (work/trace_v1.log) to HLO: what is fusion.22,
what do the 6-7 ms copies copy, and which instructions feed them.

Compiles the same jitted forward (cache-hit fast) and greps the optimized
HLO text for the named instructions.

Usage: python -u work/prof_hlo_map.py [version] [batch] [size] [names_csv]
"""

import re
import sys

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
NAMES = (sys.argv[4].split(",") if len(sys.argv) > 4 else
         ["fusion.22", "fusion.120", "fusion.125", "fusion.21", "fusion.20",
          "copy.5026", "copy.5631", "pad_maximum_fusion.4",
          "pad_slice_fusion.19", "fusion.367", "fusion.256"])

model = piv_liteflownet(version=VERSION)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params)
key = jax.random.PRNGKey(0)
img1 = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.bfloat16)
img2 = jax.random.uniform(jax.random.fold_in(key, 1),
                          (BATCH, SIZE, SIZE, 3), jnp.bfloat16)

fn = jax.jit(lambda a, b: forward(params, a, b, model.cfg, train=False))
compiled = fn.lower(img1, img2).compile()
try:
    txt = compiled.as_text()
except Exception as e:
    print("as_text failed:", repr(e)[:300], flush=True)
    sys.exit(1)
print(f"HLO text: {len(txt)} chars", flush=True)

lines = txt.splitlines()

# instruction definition lines: "  %name = type op(...)"
defs = {}
for i, ln in enumerate(lines):
    m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = ", ln)
    if m:
        defs.setdefault(m.group(1), i)

# fused computation bodies by name
comp_start = {}
for i, ln in enumerate(lines):
    m = re.match(r"%?([\w.\-]+) \(", ln)
    if m:
        comp_start[m.group(1)] = i


def show_def(name):
    i = defs.get(name)
    if i is None:
        print(f"== {name}: NOT FOUND", flush=True)
        return
    ln = lines[i].strip()
    print(f"== {name}:", flush=True)
    print("   " + ln[:400], flush=True)
    m = re.search(r"calls=%?([\w.\-]+)", ln)
    if m:
        body = m.group(1)
        j = comp_start.get(body)
        if j is not None:
            # op-type census of the fused computation body
            census = {}
            k = j + 1
            while k < len(lines) and not lines[k].startswith("}"):
                mm = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = \S+ ([\w\-]+)\(", lines[k])
                if mm:
                    census[mm.group(1)] = census.get(mm.group(1), 0) + 1
                k += 1
            print(f"   body ops: {sorted(census.items(), key=lambda x: -x[1])[:12]}",
                  flush=True)
            # show source metadata hints
            srcs = set()
            for l2 in lines[j + 1 : k]:
                for sm in re.finditer(r'source_file="([^"]+)" source_line=(\d+)', l2):
                    srcs.add(f"{sm.group(1).split('/')[-1]}:{sm.group(2)}")
            if srcs:
                print(f"   sources: {sorted(srcs)[:14]}", flush=True)


for n in NAMES:
    show_def(n)
