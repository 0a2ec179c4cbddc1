"""Fused conv-chain Pallas kernel: a whole NetE conv stack in one launch.

XLA's conv tiling needs batch >= 8 to reach full MXU rate on large frames
(measured r2: 3x3 128ch = 6.2-6.7 ms/4Mpx at b>=8 but 18.6-20.9 at b1-2,
BASELINE.md); the v1 flagship's best end-to-end batch is 2, so its conv
stacks run ~3x under the floor and lose ~25 ms/pair to scheduling. External
space-to-batch banding recovers the isolated stacks but loses in-model to
slice/concat traffic (r2 negative result).

This kernel removes the batch dependency: one ``pallas_call`` computes an
ENTIRE conv chain (e.g. the S stack 130->128->64->32->2, reference
``src/models.py:190-217``) tile by tile with VMEM-resident intermediates —
no inter-conv HBM round trips, and MXU work tiled by (rows x cols), not
batch.

STATUS (r3): measured NEGATIVE, kept opt-in as the record. Best standalone
S-stack b2 @1024^2: 24.8 ms/pair (dot2d + last-layer N-fold, t32x512) vs
XLA 14.8 — the XLA stack standalone at b2 is NOT the bottleneck the
in-model attribution suggested; the in-model conv loss (59 vs ~35 ms floor)
is scheduling/fusion-boundary cost around the other ops, which a standalone
replacement kernel cannot recover. Optimization trail, all exact
(interpret-parity-tested): 3D row-batched dots 137-160 ms (per-row M=cols
matmuls, pipeline-latency-bound) -> 2D collapsed dots 30-38 ms -> + N-fold
last layer 24.8 ms. kx->K lane-concat folding is NOT lowerable (Mosaic
rejects concat of vregs at different sublane offsets).

Design:
- Tiles of (th x tw) output pixels with an m=8 halo margin each side, DMA'd
  from the globally zero-padded input (so tile borders read REAL neighbors,
  and true image edges read zeros = SAME-conv semantics). The margin keeps
  every DMA x-offset 8-aligned (the sublane-dim constraint).
- Each conv consumes its halo: regions shrink by 2*(k//2) per layer
  (shrinking-region formulation — exact, no garbage tracking). Total chain
  halo must be <= m (v1 M/S: 6, v2 M/S: 8, R 3x3-stack: 6).
- Layout (rows, cols, ch): rows untiled (free y-tap offsets), cols in
  sublanes (x-taps are static sublane shifts), channels in lanes (the
  matmul contraction dim). Each tap is one MXU ``dot_general`` with f32
  accumulation.
- The first conv consumes the concat parts separately
  (``conv(concat(xs), W) = sum_i conv(x_i, W_i)``, the model's ``_cl_split``
  trick) so 130/131-channel inputs never materialize.
- Weights live whole in VMEM (largest stack < 1 MB).

Forward-only (training keeps XLA convs — differentiable for free).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

M = 8  # halo margin per side; total chain halo must be <= M
LEAKY = 0.1


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def conv_chain_pallas(
    parts: Sequence[jax.Array],
    weights: Sequence[jax.Array],
    biases: Sequence[jax.Array],
    last_linear: bool = True,
    tile_h: int = 16,
    tile_w: int = 128,
    dot2d: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Conv chain over ``concat(parts, axis=-1)`` — SAME padding, stride 1,
    LeakyReLU(0.1) after every conv (except the last when ``last_linear``).

    parts: list of [B, H, W, C_i] NHWC arrays (the virtual concat input).
    weights[i]: [kh, kw, Cin_i, Cout_i] HWIO; weights[0] consumes sum(C_i).
    Returns [B, H, W, Cout_last].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, _ = parts[0].shape
    n_convs = len(weights)
    halos = [(wt.shape[0] // 2, wt.shape[1] // 2) for wt in weights]
    total_hy = sum(hy for hy, _ in halos)
    total_hx = sum(hx for _, hx in halos)
    assert max(total_hy, total_hx) <= M, f"chain halo {halos} > margin {M}"
    dtype = parts[0].dtype

    th = min(tile_h, _round_up(h, 8))
    tw = min(tile_w, _round_up(w, 8))
    hp = _round_up(h, th)
    wp = _round_up(w, tw)
    nth, ntw = hp // th, wp // tw
    sh = th + 2 * M
    sw = tw + 2 * M
    # dot2d pads every tap's column window up to a multiple of 8 so the
    # (rows, cols, 128) tap block collapses to ONE (rows*cols, 128) @
    # (128, cout) MXU matmul (the 3D dot_general lowers to per-row M=cols
    # matmuls — pipeline-latency-bound). The extra 8 slab columns keep the
    # widened windows in bounds; their outputs are garbage and are sliced.
    xp = 8 if dot2d else 0
    swa = sw + xp  # allocated slab width
    cout_last = weights[-1].shape[-1]

    # Repack the virtual concat into 128-lane GROUPS: Mosaic DMA requires
    # every array's lane dim to be a 128-multiple (sub-128 windows crash
    # the compiler — bisected in work/dbg_mosaic.py P3/P5). conv(concat)
    # splits at any channel boundary, so groups are free to cut across
    # parts; the final group zero-pads (its extra matmul K-width is the
    # price of the DMA constraint).
    part_cs = [p.shape[-1] for p in parts]
    total_c = sum(part_cs)
    assert total_c == weights[0].shape[2], "weights[0] Cin mismatch"
    groups = []      # [B, H, W, <=128] arrays
    cur, cur_c = [], 0
    for p in parts:
        while p.shape[-1] > 0:
            take = min(128 - cur_c, p.shape[-1])
            cur.append(p[..., :take])
            cur_c += take
            p = p[..., take:]
            if cur_c == 128:
                groups.append(cur[0] if len(cur) == 1 else
                              jnp.concatenate(cur, axis=-1))
                cur, cur_c = [], 0
    if cur_c:
        g = cur[0] if len(cur) == 1 else jnp.concatenate(cur, axis=-1)
        groups.append(jnp.pad(g, ((0, 0),) * 3 + ((0, 128 - cur_c),)))
    n_groups = len(groups)
    w0_parts = []
    for gi in range(n_groups):
        wslice = weights[0][:, :, gi * 128:(gi + 1) * 128, :]
        if wslice.shape[2] < 128:
            wslice = jnp.pad(
                wslice, ((0, 0), (0, 0), (0, 128 - wslice.shape[2]), (0, 0)))
        w0_parts.append(wslice)

    padded = [
        jnp.pad(g, ((0, 0), (M, M + hp - h), (M, M + wp - w + xp), (0, 0)))
        for g in groups
    ]
    # middle convs run at K=N=128 (zero-padded): N-padding is free on the
    # MXU and keeps every intermediate store full-lane; the last conv keeps
    # its true cout (it writes the output block, never a scratch ref)
    def pad_kn(wt, n_to=None):
        kh_, kw_, ci_, co_ = wt.shape
        return jnp.pad(wt, ((0, 0), (0, 0), (0, 128 - ci_),
                            (0, (n_to or co_) - co_)))

    mids = [pad_kn(wt, 128) for wt in weights[1:-1]]
    # N-fold for the last conv when kw*cout fits one MXU N-tile: systolic
    # time goes with ceil(K/128)*ceil(N/128)*M, so a kw=7, cout=2 layer as
    # 49 per-tap (M,128)@(128,2) dots burns 49 M-passes with 126/128 of the
    # array idle; folding the x-taps into N ((kh) dots of (M,128)@(128,14)
    # + a shifted-add combine) does it in kh M-passes. Only the last layer:
    # its output never round-trips the 128-lane inter scratch.
    wl = weights[-1]
    nfold_last = (dot2d and n_convs > 1
                  and wl.shape[1] * wl.shape[3] <= 128)
    if nfold_last:
        klh, klw, lci, lco = wl.shape
        wlp = jnp.pad(wl, ((0, 0), (0, 0), (0, 128 - lci), (0, 0)))
        # [ky][ci][kx*co+n] = wl[ky, kx, ci, n]
        last = wlp.transpose(0, 2, 1, 3).reshape(klh, 128, klw * lco)
    else:
        last = pad_kn(weights[-1]) if n_convs > 1 else None
    w0p = [pad_kn(w, 128 if n_convs > 1 else None)
           for w in w0_parts]  # already K=128; pad N
    wt_inputs = [w.astype(dtype) for w in w0p] + \
        [w.astype(dtype) for w in mids] + \
        ([last.astype(dtype)] if last is not None else [])
    b_pad = [jnp.pad(bb, (0, 128 - bb.shape[0])) for bb in biases[:-1]]
    b_inputs = [bb.astype(dtype) for bb in b_pad] + [biases[-1].astype(dtype)]
    n_w, n_b = len(wt_inputs), len(b_inputs)

    def tap_sum_ref(src, ri, ci, wref):
        """sum_{ky,kx} src[ky:ky+r', kx:kx+c', :] @ W[ky,kx] -> (r', c', N) f32.

        ``src`` is a VMEM Ref (rows untiled): the ky loop is a fori_loop
        with pl.ds row slicing — a fully unrolled 7x7 (49 matmul sites)
        made the Mosaic compile explode (compile-helper OOM-killed), and
        dynamic_slice on VALUES has no Mosaic lowering, so every layer's
        input lives in a ref. All K dims are zero-padded to 128 (no lane
        slicing anywhere; the extra MXU K-width costs ~0.3 ms/pair total).

        dot2d: each tap block is collapsed (rows, cols8, 128) ->
        (rows*cols8, 128) for one large-M MXU matmul; cols8 = cp rounded up
        to a sublane multiple (the collapse is then layout-free). The
        <=7 garbage columns read real slab bytes (never out of bounds —
        the slab is xp wider) and are sliced off after the ky loop.
        """
        from jax.experimental import pallas as pl

        kh, kw = wref.shape[0], wref.shape[1]
        rp = ri - (kh - 1)
        cp = ci - (kw - 1)
        cpp = _round_up(cp, 8)
        cout = wref.shape[3]

        if dot2d:
            # (Folding kx into K via lane-concat of the shifted views is
            # NOT lowerable: tpu.concatenate rejects inputs at different
            # sublane offsets — "result/input offset mismatch on non-concat
            # dimension". Per-kx 2D dots it is; for N=128 layers the
            # M-pass count is identical anyway.)
            def body(ky, acc):
                rows = src[pl.ds(ky, rp)]
                wky = wref[ky]
                for kx in range(kw):
                    m2 = rows[:, kx:kx + cpp, :].reshape(rp * cpp, 128)
                    acc = acc + jax.lax.dot_general(
                        m2, wky[kx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                return acc

            acc = jax.lax.fori_loop(
                0, kh, body, jnp.zeros((rp * cpp, cout), jnp.float32))
            return acc.reshape(rp, cpp, cout)[:, :cp, :]

        def body(ky, acc):
            rows = src[pl.ds(ky, rp)]
            wky = wref[ky]  # (kw, 128, cout); dim 0 untiled -> dynamic ok
            for kx in range(kw):
                acc = acc + jax.lax.dot_general(
                    rows[:, kx:kx + cp, :], wky[kx],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            return acc

        return jax.lax.fori_loop(
            0, kh, body, jnp.zeros((rp, cp, cout), jnp.float32))

    def tap_sum_nfold(src, ri, ci, wref, kh, kw, cout):
        """Last-layer N-fold: per ky, ONE (rp*cpw, 128) @ (128, kw*cout)
        matmul over the UNSHIFTED window, then a shifted-add combine
        ``out[:, j, n] = sum_kx y[:, j+kx, kx*cout+n]``. kh M-passes total
        (vs kh*kw per-tap) since kw*cout <= one MXU N-tile."""
        from jax.experimental import pallas as pl

        rp = ri - (kh - 1)
        cp = ci - (kw - 1)
        cpw = _round_up(cp + kw - 1, 8)  # window incl. x-taps, 8-aligned

        def body(ky, acc):
            rows = src[pl.ds(ky, rp)]
            m2 = rows[:, 0:cpw, :].reshape(rp * cpw, 128)
            return acc + jax.lax.dot_general(
                m2, wref[ky],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        y = jax.lax.fori_loop(
            0, kh, body,
            jnp.zeros((rp * cpw, kw * cout), jnp.float32),
        ).reshape(rp, cpw, kw * cout)
        out = y[:, 0:cp, 0:cout]
        for kx in range(1, kw):
            out = out + y[:, kx:kx + cp, kx * cout:(kx + 1) * cout]
        return out

    def finish(acc, bias, act):
        y = acc + bias[:].astype(jnp.float32)
        if act:
            y = jnp.where(y >= 0, y, y * jnp.float32(LEAKY))
        return y.astype(dtype)

    def kernel(*refs):
        idx = 0
        part_hbm = refs[idx:idx + n_groups]; idx += n_groups
        wrefs = refs[idx:idx + n_w]; idx += n_w
        brefs = refs[idx:idx + n_b]; idx += n_b
        out_ref = refs[idx]; idx += 1
        slabs = refs[idx]; idx += 1
        inter = refs[idx]; idx += 1
        sems = refs[idx]

        ib = pl.program_id(0)
        ti = pl.program_id(1)
        tj = pl.program_id(2)

        # parts stream through a 2-slot shared slab (VMEM: one buffer, not
        # one per part) with the next part's DMA in flight during this
        # part's taps
        def start_dma(k):
            d = pltpu.make_async_copy(
                part_hbm[k].at[ib, pl.ds(ti * th, sh), pl.ds(tj * tw, swa), :],
                slabs.at[k % 2],
                sems.at[k % 2],
            )
            d.start()
            return d

        dmas = [start_dma(0)]

        def mask_outside(x, off):
            """Zero the rows/cols that lie outside the real image: a SAME
            chain pads EVERY layer's input with zeros at the image border,
            but this tile's margins carry the previous conv's values there
            (they see real pixels within their halo). Interior margins are
            real neighbors and stay untouched."""
            rows, cols = x.shape[0], x.shape[1]
            g0y = ti * th - M + off  # global row of x[0]
            g0x = tj * tw - M + off
            ri = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) + g0y
            ci = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1) + g0x
            ok = (ri >= 0) & (ri < h) & (ci >= 0) & (ci < w)
            # minor-dim insert must happen on a 32-bit type (Mosaic), so
            # cast the mask to f32 first, then down to the compute dtype
            okf = ok.astype(jnp.float32)[:, :, None]
            return x * okf.astype(x.dtype)

        # conv1: sum over group slabs (refs)
        acc = None
        for k in range(n_groups):
            if k + 1 < n_groups:
                dmas.append(start_dma(k + 1))
            dmas[k].wait()
            t = tap_sum_ref(slabs.at[k % 2], sh, sw, wrefs[k])
            acc = t if acc is None else acc + t
        ri = sh - 2 * halos[0][0]
        ci = sw - 2 * halos[0][1]
        off = halos[0][0]
        x = finish(acc, brefs[0], act=(n_convs > 1 or not last_linear))

        # middle convs ping-pong through the inter scratch (every layer's
        # input must be a ref: dynamic_slice on values has no lowering)
        for i in range(1, n_convs):
            x = mask_outside(x, off)
            # single buffer: all of this layer's reads complete before the
            # next store (tap_sum_ref materializes its output value first)
            inter[0:ri, 0:ci, :] = x
            act = (i < n_convs - 1) or not last_linear
            wr = wrefs[n_groups + i - 1]
            if i == n_convs - 1 and nfold_last:
                t = tap_sum_nfold(inter, ri, ci, wr, klh, klw, lco)
            else:
                t = tap_sum_ref(inter, ri, ci, wr)
            x = finish(t, brefs[i], act)
            ri -= 2 * halos[i][0]
            ci -= 2 * halos[i][1]
            off += halos[i][0]

        # x extent: (sh - 2*total_hy, sw - 2*total_hx); the (th, tw) center
        # sits at offset (M - total_hy, M - total_hx). Output is written
        # channel-leading ([cout, th, tw] lanes=tw): a (th, tw, 2)-shaped
        # block would lane-pad 2 -> 128 and waste 64x the VMEM/store.
        oy = M - total_hy
        ox = M - total_hx
        center = x[oy:oy + th, ox:ox + tw, :]
        out_ref[0] = jnp.moveaxis(center, -1, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, nth, ntw),
        in_specs=(
            [pl.BlockSpec(memory_space=pl.ANY) for _ in padded]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)
               for _ in range(n_w + n_b)]
        ),
        out_specs=pl.BlockSpec(
            (1, cout_last, th, tw), lambda ib, i, j: (ib, 0, i, j),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, sh, swa, 128), dtype),  # group slabs (2 slots)
            pltpu.VMEM((sh, swa, 128), dtype),     # layer intermediate
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, cout_last, hp, wp), dtype),
        # the default Mosaic budget rejects this kernel's scratch + the
        # unrolled kx matmul liveness; v5e VMEM is large enough
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*padded, *wt_inputs, *b_inputs)
    return jnp.moveaxis(out, 1, -1)[:, :h, :w, :]


def conv_chain_xla(parts, weights, biases, last_linear=True, precision=None):
    """Reference implementation (the model's _cl_split + conv2d chain)."""
    from piv_liteflownet_tpu.ops.nn import conv2d, leaky_relu

    part_cs = [p.shape[-1] for p in parts]
    w0 = weights[0]
    acc = None
    off = 0
    for p, c in zip(parts, part_cs):
        y = conv2d(p, w0[:, :, off:off + c, :], None, 1,
                   (w0.shape[0] // 2, w0.shape[1] // 2), precision)
        acc = y if acc is None else acc + y
        off += c
    x = acc + biases[0]
    if len(weights) > 1 or not last_linear:
        x = leaky_relu(x)
    for i in range(1, len(weights)):
        wt = weights[i]
        x = conv2d(x, wt, biases[i], 1, (wt.shape[0] // 2, wt.shape[1] // 2),
                   precision)
        if i < len(weights) - 1 or not last_linear:
            x = leaky_relu(x)
    return x
