"""XLA:TPU flag sweep over the full v1 forward (the in-model conv scheduling
loss is ~20 ms/pair at b4 vs the isolated stacks — maybe a compiler knob
recovers what no op rewrite did). Flags are process-level, so each config
runs in a subprocess via prof_model.py.

Usage: python -u work/prof_xla_flags.py [version] [batch] [size]
"""

import os
import subprocess
import sys

VERSION = sys.argv[1] if len(sys.argv) > 1 else "1"
BATCH = sys.argv[2] if len(sys.argv) > 2 else "4"
SIZE = sys.argv[3] if len(sys.argv) > 3 else "1024"

CONFIGS = [
    ("default", ""),
    # canary: an unknown flag. If this config RUNS (instead of aborting in
    # parse_flags_from_env), XLA_FLAGS never reach the compiler through the
    # axon remote-compile path and the whole sweep is a no-op — note that
    # instead of trusting "no effect" rows. (The CPU jaxlib rejects all
    # xla_tpu_* names, so local validation says nothing about the TPU path.)
    ("canary_bogus", "--xla_tpu_nonexistent_canary_flag=1"),
    ("vmem64M", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem96M", "--xla_tpu_scoped_vmem_limit_kib=98304"),
    ("lhs_sched", "--xla_tpu_enable_latency_hiding_scheduler=true"),
]

for name, flags in CONFIGS:
    env = dict(os.environ)
    if flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        # flag changes invalidate the persistent cache keying anyway, but be safe
        env["JAX_COMPILATION_CACHE_DIR"] = ""
    r = subprocess.run(
        [sys.executable, "-u", "work/prof_model.py", SIZE, BATCH, VERSION],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=3000,
    )
    out = (r.stdout or "").strip().splitlines()
    tail = out[-1] if out else (r.stderr or "").strip().splitlines()[-1:]
    print(f"{name:<18s} [{flags}]: {tail}", flush=True)
