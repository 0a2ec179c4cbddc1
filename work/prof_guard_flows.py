"""Guard hit-rate study for the fused rgb-warp+norm kernel (VERDICT r3 #5).

The default ``rgb_norm="auto"`` path runs the fused planar Pallas kernel only
when its exactness bounds hold on the *actual flow*: |u| <= 8 px and per-tile
(16x128) |v - round(tile-mean v)| <= 3 (``ops/pallas_rgb_warp.py:194-212``);
otherwise ``lax.cond`` falls back to the exact 10 ms gather. The bench flows
(model output on random noise) are tiny and always pass — this script measures
what REAL flows do: the trained v1 model is run on benign vs steep synthetic
PIV fields and the guard predicate is evaluated on the exact ``flow_s * sf``
tensors the R-module feeds the kernel at every level where it applies
(img >= 64x128, reference occlusion-norm semantics src/models.py:276-277).

Pure-arithmetic predicate -> runs on CPU; the ms/pair cost of fallback is the
TPU half of the study (work/r4_runner.sh).

Usage: python work/prof_guard_flows.py [size=256]
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from piv_liteflownet_tpu.data.piv_gen import (
    ParticleImageGen, shear_flow, sine_flow, uniform_flow, vortex_flow,
)
from piv_liteflownet_tpu.models.factory import piv_liteflownet
from piv_liteflownet_tpu.models.liteflownet import forward
from piv_liteflownet_tpu.ops.pallas_rgb_warp import rgb_norm_bounds_ok
from piv_liteflownet_tpu.utils.checkpoint import load_params_npz


def fields(h, w):
    return {
        # benign: the synthetic-training distribution (flows <= ~5 px)
        "benign_vortex": vortex_flow(h, w, strength=3.0),
        "benign_shear": shear_flow(h, w, strength=4.0),
        "benign_sine": sine_flow(h, w, amp=2.5, freq=2.0),
        # steep: |u| up to 8 px and high-frequency v so 16x128-tile residuals
        # blow the r=3 bound at L1 (sf=5 px units)
        "steep_vortex": vortex_flow(h, w, strength=8.0, core=0.15),
        "steep_shear": shear_flow(h, w, strength=8.0),
        "steep_sine_hf": sine_flow(h, w, amp=6.0, freq=8.0),
        "steep_drift": uniform_flow(h, w, 7.5, -6.0),
        "extreme_sine": sine_flow(h, w, amp=10.0, freq=12.0),
    }


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    model = piv_liteflownet(version=1)
    try:
        params = load_params_npz("/root/repo/work/synth_run/params_final.npz")
    except FileNotFoundError:
        print("no trained weights; using random init")
        params = model.params
    cfg = model.cfg
    gen = ParticleImageGen(image_size=(size, size))
    key = jax.random.PRNGKey(11)

    levels_desc = list(reversed(cfg.levels))  # train_out entry i -> level
    print(f"size={size}  kernel applies at levels with img >= 64x128")
    hdr = ["field", "gt|u|max", "gt|v|max"] + [f"L{l}" for l in levels_desc]
    print("  ".join(f"{h:>14s}" for h in hdr))

    fwd = jax.jit(lambda p, a, b: forward(p, a, b, cfg, train=True))
    for name, flow in fields(size, size).items():
        key, sub = jax.random.split(key)
        im1, im2 = gen.generate_pair(sub, flow)
        outs = fwd(params, im1[None], im2[None])
        cells = []
        for i, level in enumerate(levels_desc):
            flow_s = outs[i][1]
            sf = cfg.scale_factor(level)
            h, w = flow_s.shape[1], flow_s.shape[2]
            if h < 64 or w < 128:
                cells.append("--")
                continue
            ok = bool(rgb_norm_bounds_ok(flow_s * sf))
            # diagnostic: how far past the bounds
            f = np.asarray(flow_s * sf, np.float32)
            cells.append(("PASS" if ok else "FAIL") +
                         f"(u{np.abs(f[...,0]).max():.1f})")
        g = np.asarray(flow)
        row = [name, f"{np.abs(g[...,0]).max():.2f}", f"{np.abs(g[...,1]).max():.2f}"] + cells
        print("  ".join(f"{c:>14s}" for c in row))


if __name__ == "__main__":
    main()
