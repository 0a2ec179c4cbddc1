"""LiteFlowNet / LiteFlowNet2 as pure functions over a flat param pytree.

Architecture parity with reference ``src/models.py:39-717`` (LiteFlowNet,
Hui 2018; LiteFlowNet2, Hui 2020; PIV variants, Cai 2019/Silitonga 2020), but
TPU-native:

- NHWC everywhere; convs on the MXU via ``lax.conv_general_dilated``.
- Params are a flat ``dict[str, jax.Array]`` keyed with the *torch state-dict
  names* (e.g. ``"NetE_M.3.conv_M.0.weight"``) in JAX layouts (conv: HWIO;
  depthwise deconv: pre-flipped HWIO). This makes the ``.paramOnly`` weight
  converter a pure layout transpose and keeps checkpoints byte-auditable.
- One jitted forward for the whole coarse-to-fine pyramid: the Python level
  loop unrolls at trace time (static shapes per level), so XLA fuses
  warp+correlate+conv chains per level with no host round-trips.
- The in-place mean subtraction of the reference (``src/models.py:321-323``)
  is a functional subtract; the backwarp grid cache (``src/models.py:17-27``)
  is unnecessary under jit.

Pyramid-level bookkeeping matches the reference exactly, including its
``NetC_ext`` negative-indexing quirk (``src/models.py:353-355``): with
``lowest_level=1`` there are two ext modules; the list index ``pyr_level - 1``
maps actual level 2 -> ext[0] and actual level 1 -> ext[-1] = ext[1].
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Tuple, Union

import jax
import jax.numpy as jnp

# perf-experiment escape hatch (work/prof_*.py): skip the warp result fences
_NO_WARP_BARRIER = os.environ.get("PIV_NO_WARP_BARRIER", "") == "1"


def _bar(x):
    return x if _NO_WARP_BARRIER else jax.lax.optimization_barrier(x)

from piv_liteflownet_tpu.ops.correlation import correlation
from piv_liteflownet_tpu.ops.nn import (
    conv2d,
    conv2d_shift_smallcout,
    depthwise_deconv4x2,
    leaky_relu,
    netc_head_parity,
    torch_conv_init,
    unfold_nhwc,
)
from piv_liteflownet_tpu.ops.resize import resize_bilinear
from piv_liteflownet_tpu.ops.warp import backwarp, gather_warp, pack_img

Params = Dict[str, jax.Array]

# Per-pyramid-level constants, indexed by ACTUAL level (1..6); index 0 unused.
KLAST = [0, 7, 7, 5, 5, 3, 3]      # last-conv kernel size of M/S, unfold size of R
PLAST = [0, 3, 3, 2, 2, 1, 1]      # its padding
RDIST = [0, 49, 49, 25, 25, 9, 9]  # R distance channels
FEAT_CH = [0, 32, 32, 64, 96, 128, 192]
S_IN_CH = [0, 130, 130, 130, 194, 258, 386]
R_IN_CH = [0, 131, 131, 131, 131, 131, 195]


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    version: int = 1  # 1 = LiteFlowNet, 2 = LiteFlowNet2
    starting_scale: float = 40.0
    lowest_level: int = 2
    rgb_mean: Tuple[float, ...] = (
        0.411618, 0.434631, 0.454253, 0.410782, 0.433645, 0.452793,
    )
    dtype: jnp.dtype = jnp.float32
    # Feature-warp implementation ("gather" | "tent"):
    #  - "gather" (DEFAULT): packed 4-tap single-gather (ops/warp.py) — TPU
    #    gathers are descriptor-bound, so all four bilinear corner taps ride
    #    one gather of 4C-wide rows. Exact grid_sample semantics,
    #    differentiable, ~25 ms/pair per 1024^2 warp of any width. The r2/r3
    #    NHWC window/tent kernels ALL lost to it (work/experiments/ is the
    #    measured record).
    #  - "tent": planar Pallas tent kernel for the S warps
    #    (ops/pallas_feat_warp.py) — W on lanes (full VPU width at any c),
    #    per-tile integer base shifts applied by on-chip dynamic rotates so
    #    the tent is only 8x8 taps. Guarded by the on-device residual check
    #    with exact gather fallback; forward-only (training forces gather);
    #    CPU-gated like the other kernels.
    #  - "tent!": the same kernel UNGUARDED — no residual check, no
    #    lax.switch, no gather branch. Exact iff the per-tile residual bounds
    #    hold (they do for PIV-scale flows; work/guard_resid.log); out-of-
    #    bound tiles degrade to a clamped tent instead of falling back.
    #    Serves perf-critical pipelines that pre-validate their flow regime.
    warp_impl: str = "gather"
    # Space-to-batch conv banding (exact; test_banding.py): lifts isolated
    # b<8 conv stacks from ~19 to ~6.6 ms/4Mpx, but measured NET-SLOWER
    # inside the full model (band slice/concat traffic: 164 vs 144 ms/pair,
    # b2 @1024^2) — opt-in until the banding is fused into producers.
    conv_bands: bool = False
    # NetE-R occlusion-norm path ("auto" | "gather" | "pallas"):
    #  - "auto" (DEFAULT): guarded fused planar Pallas warp+norm kernel
    #    (ops/pallas_rgb_warp.py): the (r=4, lim=8) tent runs when its
    #    exactness bounds hold on the actual flow (the whole measured benign
    #    PIV regime, work/guard_resid.log), exact gather beyond that — so
    #    the result is exact at every tier. A wider steep-flow tier was
    #    measured and REVERTED: its unrolled body exceeds the 16M Mosaic
    #    scoped-VMEM stack limit (BASELINE.md r4). The warped rgb never
    #    touches HBM.
    #    Measured r3 (single tier r=3): kernel 1.27 vs gather 10.2 ms/pair
    #    standalone @1024^2; in-model v1 b2 144.2 -> 132.0 ms/pair. Falls
    #    back to "gather" automatically on CPU backends (no Mosaic lowering).
    #  - "gather": norm = sqrt(sum_c (img1 - packed-gather-warp(img2))^2).
    #  - "pallas": the tier-1 kernel unguarded (clamps out-of-window flow).
    rgb_norm: str = "auto"
    # NetE conv-stack implementation ("xla" | "pallas"):
    #  - "xla" (DEFAULT): lax.conv_general_dilated per conv (differentiable;
    #    XLA's big-frame conv tiling needs batch >= 8 for full MXU rate).
    #  - "pallas": whole M/S/R stacks as single fused kernels with
    #    VMEM-resident intermediates (ops/pallas_conv.py). Exact and tested
    #    on device, but MEASURED 9x SLOWER than XLA standalone (137 vs 14.7
    #    ms/pair, S stack b2 @1024^2, r3): the row-batched 3D dot_general
    #    does not reach MXU rate under Mosaic. Kept as the measured record;
    #    a rewrite would need explicit (M,K)x(K,N) im2col tiling.
    conv_impl: str = "xla"
    # Correlation implementation ("xla" | "planar"):
    #  - "xla" (DEFAULT): shift-stack (ops/correlation.py), differentiable.
    #  - "planar": Pallas planar kernel (ops/pallas_corr.py,
    #    correlation_planar_pallas) — W on the 128-lane axis, channel
    #    accumulation instead of a per-tap cross-lane reduce; the 49 taps
    #    read VMEM-resident slabs instead of re-reading HBM. Forward-only
    #    (training forces "xla"); applies on frames wide enough to fill the
    #    lanes (subsampled W >= 128), CPU-gated like the other kernels.
    corr_impl: str = "xla"
    # Run NetC (and the per-level ext convs) over the batch-concat of
    # (img1, img2) as ONE call: exact — batch rows are independent — and it
    # doubles the effective conv batch, which XLA's large-frame conv tiling
    # wants (full MXU rate needs batch >= 8; measured r2/r3). "auto" enables
    # it when B < 8 and no sharding context is active (a batch concat across
    # a sharded batch axis would insert resharding collectives); "on"/"off"
    # force it.
    netc_joint: str = "auto"
    # M/S flow-delta head ("auto" | "direct" | "shift"): the k>=5, cout=2
    # last convs re-read their input once per window tap under XLA's conv
    # fusion (2-lane output window). "shift" reformulates them as a 1x1 conv
    # to k*k*2 channels + tap shift-sum (ops/nn.py, conv2d_shift_smallcout;
    # 47.2 -> 16.1 ms/batch standalone at b4 1024^2 c32 k7,
    # work/lastconv.log). IN-MODEL it LOSES: 146.7 vs 129.3 ms/pair v1 b4
    # 1024^2 (work/lastconv_v1.log) — the k*k*2-channel intermediate
    # materializes through ~800 MB layout copies XLA fuses away for the
    # direct head (work/copy_census_v1.log: [B,H,W,98] {2,0,3,1} copies).
    # "auto" therefore resolves to "direct"; "shift" stays opt-in with this
    # record. Equals "direct" up to f32 summation order (tests/test_lastconv.py).
    # "pad" zero-pads cout 2 -> 32 (one MXU-aligned conv, slice the 2 real
    # lanes; exact) — the cheap middle ground between direct and shift.
    lastconv_impl: str = "auto"
    # NetC L1→L2 head ("auto" | "direct" | "parity"): "parity" runs the
    # 7x7-cin3 conv1 + stride-2 conv2.0 composite in parity (space-to-depth)
    # space — four 4x4 convs at 2.3x the MXU K-utilization emitting half-res
    # parity planes, then a 1x1+1x2+2x1+2x2 split of conv2.0 — without ever
    # materializing the full-res conv1 output that XLA's space-to-batch
    # banding relayouts around (~10.5 ms/exec of copies, work/hlo_map_v2.log).
    # Only valid when the decoder never consumes L1 features
    # (lowest_level >= 2, i.e. v2) on even H/W; exact up to f32 summation
    # order (ops/nn.netc_head_parity, tests/test_netc_head.py).
    netc_head: str = "auto"
    # Training warp VJP ("gather" | "tent"): "tent" routes stride-1 warps
    # through ops/pallas_warp_vjp.backwarp_tvjp, whose image gradient is the
    # tent-transpose Pallas kernel — the adjoint of the bilinear gather
    # expressed as a bounded gather over the adjoint — when its exactness
    # bounds hold on the flow (lax.cond fallback to the XLA scatter beyond;
    # exact either way). Forward values identical; eval unaffected (no grad
    # taken). The XLA scatter the kernel replaces is a 28.6 ms/step wall of
    # the 150.9 ms r4 train step (work/r5_wall.log); the r5 in-model
    # adjudication ships "tent" at ry=2 as the default (145.1 ms/step =
    # 55.1 samples/s, BASELINE.md round-5 table). On CPU/non-TPU backends
    # the routing falls back to the scatter, so the default is
    # backend-neutral for the test suite.
    warp_vjp: str = "tent"
    # perf-debug ablations (subsets of {"warp","corr","upcorr","S","R",...});
    # they change semantics — ONLY for attribution profiling, never accuracy.
    ablate: Tuple[str, ...] = ()

    @property
    def levels(self) -> List[int]:
        """Actual pyramid levels used, low to high (torch ``level2use``)."""
        return list(range(self.lowest_level, 7))

    def scale_factor(self, level: int) -> float:
        return float(self.starting_scale) / (2.0 ** level)


# ---------------------------------------------------------------------------
# Parameter shape table (drives init + converter validation)
# ---------------------------------------------------------------------------

def _conv_entry(name, kh, kw, cin, cout, bias=True, transpose_groups=None, pad=None, stride=1):
    return dict(
        name=name, kh=kh, kw=kw, cin=cin, cout=cout, bias=bias,
        transpose_groups=transpose_groups,
    )


def param_shapes(cfg: ModelConfig) -> List[dict]:
    """Ordered conv/deconv spec list; order matches torch state-dict order
    (used by the Caffe positional-rename contract, reference ``convert.py:23-43``)."""
    specs: List[dict] = []
    v2 = cfg.version == 2

    # NetC (reference src/models.py:66-116)
    specs += [
        _conv_entry("NetC.conv1.0", 7, 7, 3, 32),
        _conv_entry("NetC.conv2.0", 3, 3, 32, 32),
        _conv_entry("NetC.conv2.2", 3, 3, 32, 32),
        _conv_entry("NetC.conv2.4", 3, 3, 32, 32),
        _conv_entry("NetC.conv3.0", 3, 3, 32, 64),
        _conv_entry("NetC.conv3.2", 3, 3, 64, 64),
        _conv_entry("NetC.conv4.0", 3, 3, 64, 96),
        _conv_entry("NetC.conv4.2", 3, 3, 96, 96),
        _conv_entry("NetC.conv5.0", 3, 3, 96, 128),
        _conv_entry("NetC.conv6.0", 3, 3, 128, 192),
    ]
    # NetC_ext (one per i in range(lowest_level-1, 2))
    for j in range(max(0, 2 - (cfg.lowest_level - 1))):
        specs.append(_conv_entry(f"NetC_ext.{j}.conv_ext.0", 1, 1, 32, 64))

    for i, level in enumerate(cfg.levels):
        pfx = f"NetE_M.{i}"
        if level != 6:
            specs.append(_conv_entry(f"{pfx}.upConv_M", 4, 4, 2, 2, bias=False, transpose_groups=2))
        if level < 4:
            specs.append(_conv_entry(f"{pfx}.upCorr_M", 4, 4, 49, 49, bias=False, transpose_groups=49))
        if not v2:
            m_chain = [(49, 128), (128, 64), (64, 32), (32, 2)]
        else:
            m_chain = [(49, 128), (128, 128), (128, 96), (96, 64), (64, 32), (32, 2)]
        for ci, (cin, cout) in enumerate(m_chain):
            k = KLAST[level] if ci == len(m_chain) - 1 else 3
            specs.append(_conv_entry(f"{pfx}.conv_M.{2 * ci}", k, k, cin, cout))

    for i, level in enumerate(cfg.levels):
        pfx = f"NetE_S.{i}"
        if not v2:
            s_chain = [(S_IN_CH[level], 128), (128, 64), (64, 32), (32, 2)]
        else:
            s_chain = [(S_IN_CH[level], 128), (128, 128), (128, 96), (96, 64), (64, 32), (32, 2)]
        for ci, (cin, cout) in enumerate(s_chain):
            k = KLAST[level] if ci == len(s_chain) - 1 else 3
            specs.append(_conv_entry(f"{pfx}.conv_S.{2 * ci}", k, k, cin, cout))

    for i, level in enumerate(cfg.levels):
        pfx = f"NetE_R.{i}"
        if level < 5:
            specs.append(_conv_entry(f"{pfx}.moduleFeat.0", 1, 1, FEAT_CH[level], 128))
        r_chain = [(R_IN_CH[level], 128), (128, 128), (128, 64), (64, 64), (64, 32), (32, 32)]
        for ci, (cin, cout) in enumerate(r_chain):
            specs.append(_conv_entry(f"{pfx}.conv_R.{2 * ci}", 3, 3, cin, cout))
        k, d = KLAST[level], RDIST[level]
        if level < 5:
            specs.append(_conv_entry(f"{pfx}.conv_dist_R.0", k, 1, 32, d))
            specs.append(_conv_entry(f"{pfx}.conv_dist_R.1", 1, k, d, d))
        else:
            specs.append(_conv_entry(f"{pfx}.conv_dist_R.0", k, k, 32, d))
        specs.append(_conv_entry(f"{pfx}.moduleScaleX", 1, 1, d, 1))
        specs.append(_conv_entry(f"{pfx}.moduleScaleY", 1, 1, d, 1))

    return specs


def init_params(cfg: ModelConfig, key: jax.Array) -> Params:
    """Random init matching torch's Conv2d/ConvTranspose2d defaults."""
    params: Params = {}
    specs = param_shapes(cfg)
    keys = jax.random.split(key, len(specs))
    for spec, k in zip(specs, keys):
        w, b = torch_conv_init(
            k, spec["kh"], spec["kw"], spec["cin"], spec["cout"],
            bias=spec["bias"], transpose_groups=spec["transpose_groups"],
        )
        params[spec["name"] + ".weight"] = w.astype(cfg.dtype)
        if b is not None:
            params[spec["name"] + ".bias"] = b.astype(cfg.dtype)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _warp(cfg: ModelConfig, img, flow, stride: int = 1):
    """Backwarp through the configured implementation (see ModelConfig).

    Under an active spatial-sharding context (H sharded over a mesh axis,
    ``parallel.ctx.spatial_context``), levels whose shard height fits the
    halo use the exact halo-exchange warp (2*halo boundary rows over ICI
    instead of a GSPMD all-gather of the operand), guarded by the on-device
    v-bound check with a ``lax.cond`` fallback to the gather warp.

    The result is fenced with an ``optimization_barrier`` so XLA materializes
    the (expensive) warp once instead of re-fusing it into every downstream
    consumer tap (the correlation alone has 49 of them).
    """
    if "warp" in cfg.ablate:
        return img if stride == 1 else img[:, ::stride, ::stride]

    from piv_liteflownet_tpu.parallel.ctx import get_spatial_ctx

    ctx = get_spatial_ctx()
    if ctx is not None:
        n = ctx.mesh.shape[ctx.axis]
        h_out = img.shape[1] // stride
        # img H must also shard evenly (P(None, axis) in_spec): implied by
        # h_out % n == 0 for stride 1, but not for stride 2 with odd H/n.
        if (h_out % n == 0 and img.shape[1] % n == 0
                and img.shape[1] // n >= ctx.halo and n > 1):
            from piv_liteflownet_tpu.ops.halo_warp import halo_backwarp, v_bound_ok

            out = jax.lax.cond(
                v_bound_ok(flow, ctx.halo),
                lambda a, f: halo_backwarp(a, f, ctx.mesh, ctx.axis, ctx.halo, stride),
                lambda a, f: backwarp(a, f, stride),
                img, flow,
            )
            return _bar(out)

    if (cfg.warp_vjp == "tent" and stride == 1
            and img.shape[2] >= 128 and img.shape[1] >= 16):
        from piv_liteflownet_tpu.ops.pallas_warp_vjp import backwarp_tvjp

        return _bar(backwarp_tvjp(img, flow))
    out = backwarp(img, flow, stride)
    return _bar(out)


def _band_plan(shape, halo: int):
    """Space-to-batch plan for conv stacks: XLA's conv tiling needs batch >= 8
    to hit the MXU at full rate on large frames (measured: 3x3 128->128 runs
    18.6-20.9 ms/4Mpx at batch 1-4 @1024^2 but 6.2 at batch >= 8 or after
    splitting H into bands). Returns k (H-band count) or 1 when banding is
    unnecessary/inapplicable."""
    b, h, w, _ = shape
    if b >= 8 or b * h * w < 8 * 256 * 1024:
        return 1
    k = -(-8 // b)  # smallest k with b*k >= 8
    while k > 1 and (
        h % k != 0
        or h // k < max(4 * halo, 32)
        or h < h // k + 2 * halo  # clamped band windows must fit
    ):
        k -= 1
    return k


def _band_starts(h: int, k: int, halo: int):
    bh = h // k
    bh2 = bh + 2 * halo
    assert h >= bh2, f"bands of {bh}+2*{halo} rows do not fit H={h}"
    return [min(max(i * bh - halo, 0), h - bh2) for i in range(k)], bh, bh2


def _space_to_batch(x, k: int, halo: int):
    """[B,H,W,C] -> [B*k, H/k + 2*halo, W, C], overlapping H-bands
    (BATCH-major flattening: row ``j`` is batch ``j // k``, band ``j % k`` —
    the order ``ops.warp.gather_warp_banded`` emits for free, so copy-banded
    and gather-emitted bands can feed the same conv).

    Band windows are CLAMPED inside the image (edge bands are shifted inward
    rather than padded): a chain of SAME-padded convs on the bands is then
    exact everywhere — interior kept rows have their full receptive field in
    the band, and edge kept rows see the band's own zero padding, which IS
    the full-image edge condition. (Zero-padding the halo instead is wrong
    for chains: the second conv would read computed values in the virtual
    rows where the full image has per-conv zero padding.)"""
    b, h, w, c = x.shape
    starts, _, bh2 = _band_starts(h, k, halo)
    bands = [x[:, s : s + bh2] for s in starts]
    return jnp.stack(bands, axis=1).reshape(b * k, bh2, w, c)


def _batch_to_space(y, k: int, halo: int):
    """Inverse of :func:`_space_to_batch` (trims each band to its kept rows)."""
    kb, bh2 = y.shape[0], y.shape[1]
    b = kb // k
    bh = bh2 - 2 * halo
    h = k * bh
    starts, _, _ = _band_starts(h, k, halo)
    yr = y.reshape(b, k, bh2, *y.shape[2:])
    return jnp.concatenate(
        [yr[:, i, i * bh - starts[i] : i * bh - starts[i] + bh]
         for i in range(k)],
        axis=1,
    )


def _pallas_backend() -> bool:
    """Mosaic (Pallas-TPU) kernels lower on TPU backends only — 'axon' is the
    tunneled single-chip TPU this rig exposes. A GPU/CUDA backend must not
    take these paths (it would fail to compile), so the gate is an allowlist,
    not a CPU denylist (ADVICE r3)."""
    return jax.default_backend() in ("tpu", "axon")


def _use_pallas_convs(cfg: ModelConfig, shape) -> bool:
    from piv_liteflownet_tpu.parallel.ctx import get_spatial_ctx

    return (
        cfg.conv_impl == "pallas"
        and get_spatial_ctx() is None
        and shape[1] >= 32 and shape[2] >= 32
        and _pallas_backend()
    )


def _pallas_chain(p: Params, prefix: str, n_convs: int, parts,
                  last_linear: bool):
    """Run a whole ``<prefix>.{0,2,...}`` conv stack as ONE fused Pallas
    kernel (ops/pallas_conv.py) over the virtual concat of ``parts``."""
    from piv_liteflownet_tpu.ops.pallas_conv import conv_chain_pallas

    weights = [p[f"{prefix}.{2 * ci}.weight"] for ci in range(n_convs)]
    biases = [p[f"{prefix}.{2 * ci}.bias"] for ci in range(n_convs)]
    return _bar(conv_chain_pallas(parts, weights, biases, last_linear=last_linear))


def _cl(p: Params, name: str, x, stride=1, padding=0, precision=None):
    """conv + LeakyReLU(0.1)"""
    return leaky_relu(
        conv2d(x, p[f"{name}.weight"], p[f"{name}.bias"], stride, padding, precision)
    )


def _c(p: Params, name: str, x, stride=1, padding=0, precision=None):
    return conv2d(x, p[f"{name}.weight"], p[f"{name}.bias"], stride, padding, precision)


def _c_head(p: Params, name: str, x, level, cfg, precision=None):
    """The k x k -> 2ch flow-delta head of an M/S stack (see
    ``ModelConfig.lastconv_impl``)."""
    w = p[f"{name}.weight"]
    if cfg.lastconv_impl == "shift":
        return conv2d_shift_smallcout(x, w, p[f"{name}.bias"], PLAST[level],
                                      precision)
    if cfg.lastconv_impl == "pad":
        # cout 2 -> 32 zero-pad: the head runs as one MXU-aligned conv whose
        # output keeps a standard layout (no space-to-batch relayout churn),
        # then the 2 real lanes are sliced. Exact: the padded filters are
        # zero and their outputs are discarded.
        cout = w.shape[-1]
        assert cout <= 32, f"padded head supports cout <= 32, got {cout}"
        wp = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, 32 - cout)))
        out = conv2d(x, wp, None, 1, PLAST[level], precision)[..., :cout]
        return out + p[f"{name}.bias"]
    return conv2d(x, w, p[f"{name}.bias"], 1, PLAST[level], precision)


def _cl_split(p: Params, name: str, parts, padding, precision=None):
    """conv+LeakyReLU over a channel-concat, as a SUM of per-part convs.

    ``conv(concat(xs), W) == sum_i conv(x_i, W[:, :, off_i:off_i+C_i])`` —
    used for the S/R first convs whose 130/131-channel concat inputs
    (reference ``src/models.py:216,280``) would otherwise break the TPU's
    128-lane alignment (measured ~1.8x conv slowdown). Exact, not an
    approximation.
    """
    w = p[f"{name}.weight"]
    out = None
    off = 0
    for x in parts:
        ci = x.shape[-1]
        y = conv2d(x, w[:, :, off : off + ci, :], None, 1, padding, precision)
        out = y if out is None else out + y
        off += ci
    return leaky_relu(out + p[f"{name}.bias"])


def _netc(p: Params, x, precision, head_parity: bool = False) -> List[jax.Array]:
    """NetC 6-level feature pyramid (reference src/models.py:66-116).

    ``head_parity`` (see ``ModelConfig.netc_head``) computes the L1→L2 head
    in parity space and returns ``None`` at the L1 slot — callers must not
    consume it (guaranteed by the ``lowest_level >= 2`` gate)."""
    if head_parity:
        l1 = None
        l2 = netc_head_parity(
            x, p["NetC.conv1.0.weight"], p["NetC.conv1.0.bias"],
            p["NetC.conv2.0.weight"], p["NetC.conv2.0.bias"], precision)
    else:
        l1 = _cl(p, "NetC.conv1.0", x, 1, 3, precision)
        l2 = _cl(p, "NetC.conv2.0", l1, 2, 1, precision)
    l2 = _cl(p, "NetC.conv2.2", l2, 1, 1, precision)
    l2 = _cl(p, "NetC.conv2.4", l2, 1, 1, precision)
    l3 = _cl(p, "NetC.conv3.0", l2, 2, 1, precision)
    l3 = _cl(p, "NetC.conv3.2", l3, 1, 1, precision)
    l4 = _cl(p, "NetC.conv4.0", l3, 2, 1, precision)
    l4 = _cl(p, "NetC.conv4.2", l4, 1, 1, precision)
    l5 = _cl(p, "NetC.conv5.0", l4, 2, 1, precision)
    l6 = _cl(p, "NetC.conv6.0", l5, 2, 1, precision)
    return [l1, l2, l3, l4, l5, l6]


def _matching(p, pfx, cfg, level, f1, f2, flow, precision, f2p=None):
    """NetE-M descriptor matching (reference src/models.py:134-187).

    At stride-2 levels (<4) the correlation consumes only the even-phase
    pixels of the warped second map (its taps are all multiples of the
    stride), so the warp is evaluated ONLY on that stride-2 grid
    (``backwarp(..., stride=2)``) and the correlation runs stride-1 on the
    pre-subsampled maps — identical math to warp-then-stride-2-correlate,
    at 1/4 the gather descriptors.
    """
    sf = cfg.scale_factor(level)
    if flow is not None:
        flow = depthwise_deconv4x2(flow, p[f"{pfx}.upConv_M.weight"], precision)

    from piv_liteflownet_tpu.parallel.ctx import get_spatial_ctx

    def _corr1(a, b):
        """stride-1 cost volume through the configured implementation."""
        if (cfg.corr_impl == "planar" and get_spatial_ctx() is None
                and a.shape[2] >= 128 and a.shape[1] >= 16
                and _pallas_backend()):
            from piv_liteflownet_tpu.ops.pallas_corr import correlation_planar_pallas

            return correlation_planar_pallas(_bar(a), _bar(b))
        return correlation(a, b, 1)

    if "corr" in cfg.ablate:
        b_, h_, w_, _ = f1.shape
        corr = jnp.zeros((b_, h_, w_, 49), f1.dtype) + f1[..., :1]
    elif level >= 4:
        if flow is None:
            f2c = f2
        elif f2p is not None:
            f2c = _bar(gather_warp(f2p, f2.shape[1], f2.shape[2], flow * sf))
        else:
            f2c = _warp(cfg, f2, flow * sf)
        corr = leaky_relu(_corr1(f1, f2c))
    else:
        f1s = _bar(f1[:, ::2, ::2])
        if flow is not None and "warp" not in cfg.ablate:
            fsub = flow[:, ::2, ::2] * sf
            if f2p is not None:
                f2s = _bar(gather_warp(f2p, f2.shape[1], f2.shape[2], fsub, 2))
            else:
                f2s = _warp(cfg, f2, fsub, stride=2)
        else:
            f2s = f2[:, ::2, ::2]
        corr = leaky_relu(_corr1(f1s, f2s))
        if "upcorr" not in cfg.ablate:
            corr = depthwise_deconv4x2(corr, p[f"{pfx}.upCorr_M.weight"], precision)
        else:
            corr = jnp.repeat(corr, 2, axis=1).repeat(2, axis=2) if corr.shape[1] * 2 == f1.shape[1] else corr

    x = corr
    n_convs = 4 if cfg.version == 1 else 6
    if "Mconv" in cfg.ablate:  # attribution only: skip the M conv stack
        x = jnp.asarray(1e-30, corr.dtype) * corr[..., :2]
        return x + flow if flow is not None else x
    if _use_pallas_convs(cfg, x.shape):
        x = _pallas_chain(p, f"{pfx}.conv_M", n_convs, [x], last_linear=True)
        return x + flow if flow is not None else x
    halo = (n_convs - 1) + PLAST[level]
    k = _band_plan(x.shape, halo) if cfg.conv_bands else 1
    if k > 1:
        x = _space_to_batch(x, k, halo)
    for ci in range(n_convs - 1):
        x = _cl(p, f"{pfx}.conv_M.{2 * ci}", x, 1, 1, precision)
    x = _c_head(p, f"{pfx}.conv_M.{2 * (n_convs - 1)}", x, level, cfg, precision)
    if k > 1:
        x = _batch_to_space(x, k, halo)
    return x + flow if flow is not None else x


def _subpixel(p, pfx, cfg, level, f1, f2, flow, precision, f2p=None):
    """NetE-S subpixel refinement (reference src/models.py:190-217)."""
    sf = cfg.scale_factor(level)
    n_convs = 4 if cfg.version == 1 else 6
    halo = (n_convs - 1) + PLAST[level]
    k = _band_plan(f1.shape, halo) if cfg.conv_bands else 1
    if k > 1 and f2p is not None and "warpS" not in cfg.ablate:
        # Producer-fused banding: the warp gather EMITS the band layout
        # (index arrangement is free on a descriptor-bound gather), so the
        # expensive tensor of the stack never makes a band-copy round-trip.
        from piv_liteflownet_tpu.ops.warp import gather_warp_banded

        starts, _, bh2 = _band_starts(f1.shape[1], k, halo)
        f2w_b = _bar(gather_warp_banded(
            f2p, f2.shape[1], f2.shape[2], flow * sf, starts, bh2))
        parts = [_space_to_batch(f1, k, halo), f2w_b,
                 _space_to_batch(flow, k, halo)]
        x = _cl_split(p, f"{pfx}.conv_S.0", parts, 1, precision)
        for ci in range(1, n_convs - 1):
            x = _cl(p, f"{pfx}.conv_S.{2 * ci}", x, 1, 1, precision)
        x = _c_head(p, f"{pfx}.conv_S.{2 * (n_convs - 1)}", x, level, cfg, precision)
        return _batch_to_space(x, k, halo) + flow
    from piv_liteflownet_tpu.parallel.ctx import get_spatial_ctx

    use_tent = (
        cfg.warp_impl in ("tent", "tent!") and get_spatial_ctx() is None
        and f2.shape[2] >= 128 and f2.shape[1] >= 16
        and _pallas_backend()
    )
    if "warpS" in cfg.ablate:
        f2w = f2
    elif use_tent:
        from piv_liteflownet_tpu.ops.pallas_feat_warp import (
            feat_warp, feat_warp_pallas, FEAT_WARP_TIERS)

        if cfg.warp_impl == "tent!":  # unguarded: no switch, no gather branch
            ry, rx = FEAT_WARP_TIERS[0]
            f2w = _bar(feat_warp_pallas(f2, flow * sf, ry, rx))
        else:
            f2w = _bar(feat_warp(f2, flow * sf))
    elif f2p is not None:
        f2w = _bar(gather_warp(f2p, f2.shape[1], f2.shape[2], flow * sf))
    else:
        f2w = _warp(cfg, f2, flow * sf)
    parts = [f1, f2w, flow]
    if _use_pallas_convs(cfg, f1.shape):
        return _pallas_chain(p, f"{pfx}.conv_S", n_convs, parts, last_linear=True) + flow
    if k > 1:
        parts = [_space_to_batch(t, k, halo) for t in parts]
    # first conv split per concat part: keeps the feature convs 128-lane
    # aligned instead of feeding a 130/194/258/386-channel concat
    x = _cl_split(p, f"{pfx}.conv_S.0", parts, 1, precision)
    for ci in range(1, n_convs - 1):
        x = _cl(p, f"{pfx}.conv_S.{2 * ci}", x, 1, 1, precision)
    x = _c_head(p, f"{pfx}.conv_S.{2 * (n_convs - 1)}", x, level, cfg, precision)
    if k > 1:
        x = _batch_to_space(x, k, halo)
    return x + flow


def _regularization(p, pfx, cfg, level, img1, img2, feat1, flow, precision):
    """NetE-R flow regularization (reference src/models.py:220-303)."""
    sf = cfg.scale_factor(level)
    k = KLAST[level]

    rm_flow = flow - jnp.mean(flow, axis=(1, 2), keepdims=True)
    from piv_liteflownet_tpu.parallel.ctx import get_spatial_ctx

    use_rgb_kernel = (
        cfg.rgb_norm in ("auto", "pallas")
        and "warpR" not in cfg.ablate
        and get_spatial_ctx() is None
        and img1.shape[1] >= 64 and img1.shape[2] >= 128
        and _pallas_backend()
    )
    if use_rgb_kernel:
        from piv_liteflownet_tpu.ops.pallas_rgb_warp import (
            rgb_warp_norm_nograd,
            rgb_warp_norm_pallas_nograd,
        )

        fn = (rgb_warp_norm_nograd if cfg.rgb_norm == "auto"
              else rgb_warp_norm_pallas_nograd)
        norm = jax.lax.stop_gradient(_bar(fn(img1, img2, flow * sf)))
    else:
        if "warpR" in cfg.ablate:
            rgb_warp = img2
        else:
            rgb_warp = _warp(cfg, img2, flow * sf)
        norm = jax.lax.stop_gradient(
            jnp.sqrt(jnp.sum(jnp.square(img1 - rgb_warp), axis=-1, keepdims=True))
        )

    # H radius of the banded region: 6 3x3 convs + the (k x 1) dist conv +
    # the unfold's k x k patches
    halo = 6 + 2 * PLAST[level]
    bk = _band_plan(flow.shape, halo) if cfg.conv_bands else 1
    flow_b = flow
    if bk > 1:
        # band feat1 BEFORE moduleFeat: 32/96-ch copy instead of 128-ch
        norm, rm_flow, feat1 = (
            _space_to_batch(t, bk, halo) for t in (norm, rm_flow, feat1)
        )
        flow_b = _space_to_batch(flow, bk, halo)
    if level < 5:
        feat_r = _cl(p, f"{pfx}.moduleFeat.0", feat1, 1, 0, precision)
    else:
        feat_r = feat1

    if "Rconv" in cfg.ablate:  # skip the 6-conv stack, keep dist+smooth
        x = jnp.pad(feat_r[..., :32], ((0, 0),) * 3 + ((0, max(0, 32 - feat_r.shape[-1])),))
    elif bk == 1 and _use_pallas_convs(cfg, norm.shape):
        # all six convs carry LeakyReLU (reference src/models.py:252-260)
        x = _pallas_chain(p, f"{pfx}.conv_R", 6, [norm, rm_flow, feat_r],
                          last_linear=False)
    else:
        x = _cl_split(p, f"{pfx}.conv_R.0", [norm, rm_flow, feat_r], 1, precision)
        for ci in range(1, 6):
            x = _cl(p, f"{pfx}.conv_R.{2 * ci}", x, 1, 1, precision)

    if "dist" in cfg.ablate:  # attribution only: skip the dist convs
        d = RDIST[level]
        x = jnp.pad(x, ((0, 0),) * 3 + ((0, max(0, d - x.shape[-1])),))[..., :d]
    elif level < 5:
        x = _c(p, f"{pfx}.conv_dist_R.0", x, 1, (PLAST[level], 0), precision)
        x = _c(p, f"{pfx}.conv_dist_R.1", x, 1, (0, PLAST[level]), precision)
    else:
        x = _c(p, f"{pfx}.conv_dist_R.0", x, 1, PLAST[level], precision)

    negsq = -jnp.square(x)
    dist = jnp.exp(negsq - jnp.max(negsq, axis=-1, keepdims=True))
    divisor = 1.0 / jnp.sum(dist, axis=-1, keepdims=True)

    if "Rsmooth" in cfg.ablate:  # skip unfold+softmax-dot, keep the rest live
        out = flow_b + jnp.asarray(1e-30, flow.dtype) * dist[..., :2]
        return _batch_to_space(out, bk, halo) if bk > 1 else out

    def smooth(comp, scale_name):
        patches = unfold_nhwc(flow_b[..., comp : comp + 1], k)
        return _c(p, f"{pfx}.{scale_name}", dist * patches, 1, 0, precision) * divisor

    out = jnp.concatenate([smooth(0, "moduleScaleX"), smooth(1, "moduleScaleY")], axis=-1)
    return _batch_to_space(out, bk, halo) if bk > 1 else out


def forward(
    params: Params,
    img1: jax.Array,
    img2: jax.Array,
    cfg: ModelConfig,
    train: bool = False,
    precision=None,
) -> Union[jax.Array, List[List[jax.Array]]]:
    """Full coarse-to-fine forward pass.

    img1, img2: [B, H, W, 3] in [0, 1], H and W multiples of 32.
    Eval: returns final flow [B, H', W', 2] scaled by SCALEFACTOR[1]
    (H' = H / 2^(lowest_level-1)). Train: per-level [M, S, R] raw flows,
    coarsest level first (+ LiteFlowNet2: final flow upsampled to input size).
    Matches reference ``src/models.py:319-370`` / ``:660-716``.
    """
    if train and cfg.conv_impl != "xla":
        # the fused conv-chain kernel is forward-only
        cfg = dataclasses.replace(cfg, conv_impl="xla")
    if train and cfg.corr_impl != "xla":
        # the planar correlation kernel is forward-only
        cfg = dataclasses.replace(cfg, corr_impl="xla")
    if train and cfg.warp_impl in ("tent", "tent!"):
        # the planar tent warp is forward-only
        cfg = dataclasses.replace(cfg, warp_impl="gather")

    mean = jnp.asarray(cfg.rgb_mean, img1.dtype)
    x1 = img1 - mean[:3]
    x2 = img2 - mean[3:]
    in_h, in_w = x1.shape[1], x1.shape[2]

    batch = x1.shape[0]
    # "auto" resolves to OFF: the 2B-batch joint NetC wins standalone (~0.4
    # ms/pair) but LOSES in-model at every measured shape — r4g probes
    # (work/netc_v1.log, work/netc_v2.log): v1 1024^2 b4 135.1 -> 129.3,
    # 512^2 32.1 -> 31.1, 256^2 9.03 -> 8.91; v2 1024^2 42.3 -> 40.0,
    # 256^2 3.11 -> 2.72 — the concat/slice traffic and the scheduling
    # serialization around the joint call outweigh the batched-conv gain.
    # "on" stays available (exact; test_netc_joint.py).
    netc_joint = cfg.netc_joint == "on"
    # Parity NetC head: only when the decoder never reads L1 features and
    # the frame parities are well-defined ("auto" stays direct until the
    # in-model adjudication lands — see ModelConfig.netc_head).
    head_parity = (
        cfg.netc_head == "parity"
        and cfg.lowest_level >= 2
        and x1.shape[1] % 2 == 0 and x1.shape[2] % 2 == 0
    )
    if "NetC" in cfg.ablate:  # attribution only: shape-true zero pyramids
        chans = [32, 32, 64, 96, 128, 192]
        feat1, feat2 = [], []
        h, w = x1.shape[1], x1.shape[2]
        for li in range(6):
            feat1.append(jnp.zeros((batch, h, w, chans[li]), x1.dtype)
                         + x1[:, :h, :w, :1])
            feat2.append(jnp.zeros((batch, h, w, chans[li]), x2.dtype)
                         + x2[:, :h, :w, :1])
            h, w = -(-h // 2), -(-w // 2)
    elif netc_joint:
        feats = _netc(params, jnp.concatenate([x1, x2], axis=0), precision,
                      head_parity)
        feat1 = [f[:batch] if f is not None else None for f in feats]
        feat2 = [f[batch:] if f is not None else None for f in feats]
    else:
        feat1 = _netc(params, x1, precision, head_parity)
        feat2 = _netc(params, x2, precision, head_parity)

    # Image pyramid at feature resolutions (list index = actual level - 1).
    if netc_joint:  # one 2B-batch resize chain (exact, like NetC above)
        pyr1, pyr2 = [x1], [x2]
        p12 = jnp.concatenate([x1, x2], axis=0)
        for li in range(1, 6):
            h, w = feat1[li].shape[1], feat1[li].shape[2]
            p12 = resize_bilinear(p12, h, w, precision)
            pyr1.append(p12[:batch])
            pyr2.append(p12[batch:])
    else:
        pyr1, pyr2 = [x1], [x2]
        for li in range(1, 6):
            h, w = feat1[li].shape[1], feat1[li].shape[2]
            pyr1.append(resize_bilinear(pyr1[-1], h, w, precision))
            pyr2.append(resize_bilinear(pyr2[-1], h, w, precision))

    levels = cfg.levels  # low..high actual levels
    n_ext = max(0, 2 - (cfg.lowest_level - 1))

    flow = None
    train_out: List[List[jax.Array]] = []
    for level in reversed(levels):
        i = level - cfg.lowest_level  # module list index
        li = level - 1  # feature/pyramid list index
        if level <= 2:
            # reference quirk: list idx 1 (level 2) -> ext[0]; idx 0 (level 1) -> ext[-1]
            ext_idx = 0 if level == 2 else n_ext - 1
            ext_name = f"NetC_ext.{ext_idx}.conv_ext.0"
            if netc_joint:
                f12 = _cl(params, ext_name,
                          jnp.concatenate([feat1[li], feat2[li]], axis=0), 1, 0, precision)
                f1_in, f2_in = f12[:batch], f12[batch:]
            else:
                f1_in = _cl(params, ext_name, feat1[li], 1, 0, precision)
                f2_in = _cl(params, ext_name, feat2[li], 1, 0, precision)
        else:
            f1_in, f2_in = feat1[li], feat2[li]

        # One packed 4-tap array serves BOTH the M and S warps of this
        # level's second feature map (the pack build costs ~3 ms/pair at
        # 1024^2; profiled) — only on the plain-gather path.
        from piv_liteflownet_tpu.parallel.ctx import get_spatial_ctx

        use_pack = (
            cfg.warp_impl == "gather"
            and "warp" not in cfg.ablate
            and get_spatial_ctx() is None
            and f2_in.shape[0] < 8
        )
        f2p = _bar(pack_img(f2_in)) if use_pack else None
        flow_m = _matching(params, f"NetE_M.{i}", cfg, level, f1_in, f2_in, flow, precision, f2p)
        if "S" in cfg.ablate:
            flow_s = flow_m
        else:
            flow_s = _subpixel(params, f"NetE_S.{i}", cfg, level, f1_in, f2_in, flow_m, precision, f2p)
        if "R" in cfg.ablate:
            flow = flow_s
        else:
            flow = _regularization(
                params, f"NetE_R.{i}", cfg, level, pyr1[li], pyr2[li], feat1[li], flow_s, precision
            )
        train_out.append([flow_m, flow_s, flow])

    if train:
        if cfg.version == 2:
            up = resize_bilinear(flow, in_h, in_w, precision)
            train_out.append([up])
        return train_out
    return flow * cfg.scale_factor(1)
