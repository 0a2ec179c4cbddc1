"""Benchmark: 1024x1024 PIV image-pairs/sec/chip (north star: >=200, BASELINE.json).

Measures the flagship PIV-LiteFlowNet-en (v1, lowest_level=1) end-to-end
inference forward — the same jitted pipeline ``run.py`` uses — on the real
chip, plus the v2 backbone (quarter-res decode) and the 256^2/512^2
resolution-scaling figures as extras so progress on every size is
machine-tracked round over round.

Outage-resilient by construction (round-3 postmortem: the axon tunnel was
down at capture time and backend init blocked ~25 min per attempt without
erroring, so the driver's timeout fired before any JSON was printed —
BENCH_r03.json rc=124, parsed=null):

  1. The backend is probed FIRST in a subprocess under a hard timeout with
     SIGKILL (the axon client ignores SIGTERM). If the probe fails, the
     JSON line is printed immediately with value 0 and
     ``backend_unavailable: true`` so the driver always records something.
  2. Every measurement runs in its own time-boxed subprocess; one hung
     config costs its own box, never the whole budget.
  3. The headline JSON is printed (and flushed) as soon as the v1 sweep
     finishes; a richer final JSON (extras + projections) is printed at the
     end. The driver parses the LAST parseable JSON line, so a hang during
     extras cannot erase the headline.

Timing method: chained executable + full-sum scalar readback
(piv_liteflownet_tpu/utils/benchmark.py) — ``block_until_ready`` is
unreliable through the axon tunnel and sliced readbacks get DCE'd.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_PAIRS_PER_SEC = 200.0
METRIC = "1024^2 PIV pairs/sec/chip"
# r4g measured: backend init alone can take ~105 s when the terminal has
# been busy for hours, and the probe's tiny remote compile adds 30-90 s —
# a 180 s box produced a FALSE backend_unavailable (work/bench_r4g.log).
PROBE_TIMEOUT_S = int(os.environ.get("PIV_BENCH_PROBE_TIMEOUT", "420"))
# First fresh 1024^2 compile through the relay takes 2-6 min (work/OPS.md),
# but end-of-round r4 saw fresh v2 compiles exceed 900 s on a flaky tunnel;
# the persistent compilation cache makes repeats much cheaper.
CONFIG_TIMEOUT_S = int(os.environ.get("PIV_BENCH_CONFIG_TIMEOUT", "1200"))
TOTAL_BUDGET_S = int(os.environ.get("PIV_BENCH_TOTAL_BUDGET", "3000"))


# ---------------------------------------------------------------------------
# Child modes: run a single measurement (or probe) inside one process whose
# lifetime the orchestrator bounds with SIGKILL.
# ---------------------------------------------------------------------------

def _child_setup():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def child_probe() -> None:
    """Tiny end-to-end op proving the backend can init, compile, and read back."""
    jax = _child_setup()
    import jax.numpy as jnp

    x = jnp.ones((128, 128), jnp.bfloat16)
    val = float(jax.jit(lambda a: (a @ a).sum())(x))
    print(f"PROBE_OK {jax.default_backend()} {val}", flush=True)


def child_one(version: int, batch: int, dtype_name: str, size: int) -> None:
    jax = _child_setup()
    import jax.numpy as jnp

    from piv_liteflownet_tpu.models.factory import piv_liteflownet
    from piv_liteflownet_tpu.models.liteflownet import forward
    from piv_liteflownet_tpu.utils.benchmark import chained_time

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    model = piv_liteflownet(version=version)
    params = jax.tree.map(lambda x: x.astype(dtype), model.params)
    cfg = model.cfg

    def fn(a, b):
        return forward(params, a, b, cfg, train=False)

    key = jax.random.PRNGKey(0)
    img1 = jax.random.uniform(key, (batch, size, size, 3), dtype)
    img2 = jax.random.uniform(jax.random.fold_in(key, 1), (batch, size, size, 3), dtype)
    t = chained_time(fn, (img1, img2))
    print(f"RESULT {batch / t:.6f}", flush=True)


def child_steep() -> None:
    """The guarded-fallback operating point (VERDICT r4 weak #2): the trained
    v1 model driven by a steep/turbulent flow field that trips the rgb/feat
    exactness guards, so the machine record shows BOTH regimes — the benign
    headline (tent tiers) and the exact-gather fallback (-15-18% measured,
    BASELINE.md r4 guard tables). Uses the round-3 trained weights
    (work/synth_run/params_final.npz, tracked) + on-device synthetic particle
    pairs advected by a steep high-frequency sine field (amp 6 px, freq 8 —
    the 'steep_sine_hf' row of the r4 guard study, work/prof_guard_flows.py)."""
    jax = _child_setup()
    import jax.numpy as jnp

    from piv_liteflownet_tpu.data.piv_gen import ParticleImageGen, sine_flow
    from piv_liteflownet_tpu.models.factory import piv_liteflownet
    from piv_liteflownet_tpu.models.liteflownet import forward
    from piv_liteflownet_tpu.utils.benchmark import chained_time
    from piv_liteflownet_tpu.utils.checkpoint import load_params_npz

    batch, size = 4, 1024
    model = piv_liteflownet(version=1)
    params = load_params_npz(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "work/synth_run/params_final.npz"))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    cfg = model.cfg

    gen = ParticleImageGen(image_size=(size, size))
    field = sine_flow(size, size, amp=6.0, freq=8.0)
    ks = jax.random.split(jax.random.PRNGKey(3), batch)
    ims = [gen.generate_pair(k, field) for k in ks]
    a = jnp.stack([i1 for i1, _ in ims]).astype(jnp.bfloat16)
    b = jnp.stack([i2 for _, i2 in ims]).astype(jnp.bfloat16)

    t = chained_time(lambda x, y: forward(params, x, y, cfg, train=False),
                     (a, b))
    print(f"RESULT {batch / t:.6f}", flush=True)


def child_ingest() -> None:
    """Host-side packed-ingest rate at 1024^2 (VERDICT r5 #3): the .pivseq
    decode-free feed that backs the multi-chip serving projection. Page-cache
    warm, threads=4, batch=4 — prints pairs/s/host (1 core on this rig)."""
    import numpy as np

    from piv_liteflownet_tpu.data.native import NativeSeqLoader, get_lib
    from piv_liteflownet_tpu.data.pivseq import PivseqRun, write_pivseq

    assert get_lib() is not None, "libpivio build failed"
    size, n, batch = 1024, 48, 4
    tmp = "/tmp/bench_ingest.pivseq"
    if not os.path.isfile(tmp):
        # write the container directly (u8 mono frames)
        rng = np.random.default_rng(0)
        with open(tmp, "wb") as f:
            f.write(b"PIVSEQ01")
            f.write(np.asarray([size, size, 1, 0], np.uint32).tobytes())
            names_off = 40 + size * size * n
            f.write(np.asarray([n, names_off], np.uint64).tobytes())
            for i in range(n):
                f.write(rng.integers(0, 255, (size, size), np.uint8).tobytes())
            f.write(b"\x00".join(f"f{i:04d}.png".encode()
                                 for i in range(n)) + b"\x00")
    ds = PivseqRun(tmp)
    # warm page cache + loader, then measure
    for _ in range(2):
        ld = NativeSeqLoader(ds, batch, threads=4)
        t0 = time.time()
        seen = 0
        for (b1, b2), names in ld:
            seen += len(names)
        dt = time.time() - t0
        ld.close()
    print(f"RESULT {seen / dt:.6f}", flush=True)


def child_train() -> None:
    """Training-step throughput (reference config: v1, 256^2 crop, b8, Adam
    4-group, aug in-jit; bf16 compute — the shipping --bf16 path)."""
    jax = _child_setup()
    import jax.numpy as jnp

    from piv_liteflownet_tpu.data.transforms import Photometric, Pipeline
    from piv_liteflownet_tpu.models.factory import piv_liteflownet
    from piv_liteflownet_tpu.parallel.train_step import TrainState, make_train_step
    from piv_liteflownet_tpu.training.loss import piv_loss
    from piv_liteflownet_tpu.training.optim import make_optimizer

    SIZE, BATCH, N = 256, 8, 30
    model = piv_liteflownet(version=1)
    tx, _ = make_optimizer(model.params, model.cfg.lowest_level)
    pipe = Pipeline(
        crop_size=(SIZE, SIZE), translate=16, scale_range=(0.95, 1.45),
        hflip=True, vflip=True,
        photometric=Photometric((0.0, 0.04), (-0.8, 0.4), 0.2, (0.5, 2.0),
                                (0.7, 1.5)),
    )
    step = make_train_step(model.cfg, piv_loss(version=1), tx,
                           pipeline=pipe, compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    H = W = int(SIZE * 1.5)
    img1 = jax.random.uniform(key, (BATCH, H, W, 3), jnp.float32)
    img2 = jax.random.uniform(jax.random.fold_in(key, 1), (BATCH, H, W, 3),
                              jnp.float32)
    target = jax.random.normal(jax.random.fold_in(key, 2), (BATCH, H, W, 2),
                               jnp.float32)
    p0 = jax.tree.map(jnp.array, model.params)
    state = TrainState(p0, tx.init(p0), jnp.zeros((), jnp.int32))
    for i in range(3):
        state, m = step(state, img1, img2, target, jax.random.PRNGKey(i))
    float(m["loss"])
    t0 = time.time()
    for i in range(N):
        state, m = step(state, img1, img2, target, jax.random.PRNGKey(100 + i))
    float(m["loss"])
    print(f"RESULT {BATCH / ((time.time() - t0) / N):.6f}", flush=True)


# ---------------------------------------------------------------------------
# Orchestrator
# ---------------------------------------------------------------------------

def _run_boxed(args: list[str], timeout_s: int) -> tuple[int, str]:
    """Run a child bench process; SIGKILL on timeout (axon ignores SIGTERM)."""
    proc = subprocess.Popen(
        [sys.executable, "-u", os.path.abspath(__file__), *args],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    try:
        out, _ = proc.communicate(timeout=timeout_s)
        return proc.returncode, out or ""
    except subprocess.TimeoutExpired:
        proc.kill()
        try:
            out, _ = proc.communicate(timeout=10)
        except subprocess.TimeoutExpired:
            out = ""
        return -9, (out or "") + f"\n[killed after {timeout_s}s]"


def _measure(version: int, batch: int, dtype: str, size: int,
             timeout_s: int) -> float | None:
    rc, out = _run_boxed(["--one", str(version), str(batch), dtype, str(size)], timeout_s)
    for line in reversed(out.splitlines()):
        if line.startswith("RESULT "):
            return float(line.split()[1])
    tail = "\n".join(out.splitlines()[-3:])
    print(f"bench v{version} b={batch} {dtype} {size}^2 failed (rc={rc}): {tail}",
          file=sys.stderr, flush=True)
    return None


def main() -> None:
    t_start = time.time()

    def budget_left() -> float:
        return TOTAL_BUDGET_S - (time.time() - t_start)

    # 1. Backend probe under a hard box. A down tunnel must cost minutes, not
    #    the driver's whole budget.
    if os.environ.get("PIV_BENCH_ASSUME_DOWN"):
        rc, out = 1, "[simulated outage: PIV_BENCH_ASSUME_DOWN]"
    else:
        rc, out = _run_boxed(["--probe"], PROBE_TIMEOUT_S)
        if rc != 0 or "PROBE_OK" not in out:
            # one retry: a slow-but-alive tunnel (init ~105 s measured under
            # load) must not be recorded as an outage
            print(f"probe attempt 1 failed (rc={rc}), retrying once",
                  file=sys.stderr, flush=True)
            rc, out = _run_boxed(["--probe"], PROBE_TIMEOUT_S)
    if rc != 0 or "PROBE_OK" not in out:
        print(f"backend probe failed (rc={rc}): {out.splitlines()[-1] if out else ''}",
              file=sys.stderr, flush=True)
        print(json.dumps({
            "metric": METRIC, "value": 0.0, "unit": "pairs/s", "vs_baseline": 0.0,
            "backend_unavailable": True,
        }), flush=True)
        return

    # 2. v1 headline sweep. Batch sweep finding (BASELINE.md): with the fused
    #    rgb-norm kernel the HBM squeeze eased and b=4 became the best
    #    per-pair v1 config (r3: 129.0 ms/pair vs 132.3 at b2, 137.2 at b8).
    result = 0.0
    v1_batch: int | None = None
    for batch, dtype in ((4, "bfloat16"), (2, "bfloat16"), (1, "bfloat16"), (1, "float32")):
        if budget_left() < 120:
            break
        r = _measure(1, batch, dtype, 1024, min(CONFIG_TIMEOUT_S, int(budget_left())))
        if r is not None:
            result, v1_batch = r, batch
            break

    headline = {
        "metric": METRIC,
        "value": round(result, 3),
        "unit": "pairs/s",
        "vs_baseline": round(result / BASELINE_PAIRS_PER_SEC, 4),
        "method": "chained-scan+scalar-readback",
        "batch": v1_batch,
    }
    if v1_batch is None:
        headline["v1_failed"] = True
    # Headline goes out NOW — a hang in the extras below cannot erase it.
    print(json.dumps(headline), flush=True)

    # 3. Extras: v2 backbone (the north-star path) + resolution table.
    extras: dict[str, float] = {}
    for name, version, b, size in (
        ("v2_pairs_per_sec", 2, 4, 1024),
        ("v1_512", 1, 8, 512),
        ("v2_512", 2, 8, 512),
        ("v1_256", 1, 16, 256),
        ("v2_256", 2, 16, 256),
    ):
        if budget_left() < 120:
            print(f"bench budget exhausted before {name}", file=sys.stderr, flush=True)
            break
        r = _measure(version, b, "bfloat16", size, min(CONFIG_TIMEOUT_S, int(budget_left())))
        if r is not None:
            extras[name] = round(r, 3)

    # Training throughput (reference hot loop, trainer.py --bf16 path)
    if budget_left() >= 120:
        rc, out = _run_boxed(["--train"], min(CONFIG_TIMEOUT_S, int(budget_left())))
        for line in reversed(out.splitlines()):
            if line.startswith("RESULT "):
                extras["train_samples_per_sec"] = round(float(line.split()[1]), 2)
                break
        else:
            print(f"bench train failed (rc={rc})", file=sys.stderr, flush=True)

    # Steep-flow operating point: trained weights + guard-tripping field ->
    # the exact-gather fallback tier (both regimes machine-recorded; the
    # headline above is the benign/tent regime)
    if budget_left() >= 120:
        rc, out = _run_boxed(["--steep"], min(CONFIG_TIMEOUT_S, int(budget_left())))
        for line in reversed(out.splitlines()):
            if line.startswith("RESULT "):
                extras["v1_steep_guarded_fallback_pairs_per_sec"] = round(
                    float(line.split()[1]), 3)
                break
        else:
            print(f"bench steep failed (rc={rc})", file=sys.stderr, flush=True)

    # Packed-ingest host rate (decode-free .pivseq feed; backs the x8 DP
    # projection's host-feed arithmetic — BASELINE.md serving feasibility)
    if budget_left() >= 60:
        rc, out = _run_boxed(["--ingest"], min(300, int(budget_left())))
        for line in reversed(out.splitlines()):
            if line.startswith("RESULT "):
                extras["ingest_1024_packed_pairs_per_sec"] = round(
                    float(line.split()[1]), 1)
                break
        else:
            print(f"bench ingest failed (rc={rc})", file=sys.stderr, flush=True)

    # The 200 pairs/s north star is a v2-backbone x N-chips plan (BASELINE.md):
    # inference DP has zero cross-chip communication (params replicated, batch
    # sharded — parallel/, run.py --num_devices), so aggregate throughput is
    # linear in chips up to the input pipeline. Only 1 real chip is reachable
    # in this harness, so the x8 figure is a PROJECTION, kept under its own
    # key so it cannot be misread as a measurement.
    projections = {}
    if "v2_pairs_per_sec" in extras:
        projections["v2_x8_linear_dp"] = round(extras["v2_pairs_per_sec"] * 8, 1)

    final = dict(headline)
    final.update(extras)
    if projections:
        final["projections"] = projections
    print(json.dumps(final), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--probe":
        child_probe()
    elif len(sys.argv) > 1 and sys.argv[1] == "--train":
        child_train()
    elif len(sys.argv) > 1 and sys.argv[1] == "--steep":
        child_steep()
    elif len(sys.argv) > 1 and sys.argv[1] == "--ingest":
        child_ingest()
    elif len(sys.argv) > 1 and sys.argv[1] == "--one":
        child_one(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], int(sys.argv[5]))
    else:
        main()
