"""CPU torch oracles used only by the test suite.

The reference's correlation requires a CUDA device (its CPU branch raises
``NotImplementedError``, reference ``src/correlation.py:339-340``) and its
``backwarp`` grid cache calls ``.cuda()`` (reference ``src/models.py:27``), so
to run the *actual reference model code* as a parity oracle on CPU we provide
semantically-identical torch ops to patch in. These re-derive the documented
semantics; they are not copies of the reference CUDA kernels.
"""

from __future__ import annotations

import torch
import torch.nn.functional as F


def torch_correlation(tensorFirst, tensorSecond, intStride):
    """7x7-window local correlation: out[b,d,y,x] = mean_c f1[b,c,ys,xs] *
    f2pad[b,c,ys+dy*s, xs+dx*s], d = (dy+3)*7 + (dx+3)."""
    b, c, h, w = tensorFirst.shape
    s = intStride
    pad = 3 * s
    f2p = F.pad(tensorSecond, (pad, pad, pad, pad))
    f1s = tensorFirst[:, :, ::s, ::s]
    outs = []
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            sl = f2p[:, :, pad + dy * s : pad + dy * s + h, pad + dx * s : pad + dx * s + w]
            sl = sl[:, :, ::s, ::s]
            outs.append((f1s * sl).mean(1))
    return torch.stack(outs, 1)


def torch_backwarp(tensorInput, tensorFlow):
    """grid_sample(zeros, align_corners=True) backwarp, CPU-safe."""
    b, _, h, w = tensorFlow.shape
    gx = torch.linspace(-1.0, 1.0, w).view(1, 1, 1, w).expand(b, -1, h, -1)
    gy = torch.linspace(-1.0, 1.0, h).view(1, 1, h, 1).expand(b, -1, -1, w)
    grid = torch.cat([gx, gy], 1)
    in_h, in_w = tensorInput.shape[2], tensorInput.shape[3]
    flow = torch.cat(
        [
            tensorFlow[:, 0:1] / ((in_w - 1.0) / 2.0),
            tensorFlow[:, 1:2] / ((in_h - 1.0) / 2.0),
        ],
        1,
    )
    return F.grid_sample(
        tensorInput,
        (grid + flow).permute(0, 2, 3, 1),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=True,
    )


def load_reference_models():
    """Import the reference model module with CPU-safe op patches applied."""
    import sys
    import types

    if "cupy" not in sys.modules:
        fake = types.ModuleType("cupy")
        fake.util = types.SimpleNamespace(memoize=lambda **kw: (lambda fn: fn))
        fake.cuda = types.SimpleNamespace(compile_with_cache=None)
        sys.modules["cupy"] = fake
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import src.models as ref_models

    ref_models.FunctionCorrelation = (
        lambda tensorFirst, tensorSecond, intStride: torch_correlation(
            tensorFirst, tensorSecond, intStride
        )
    )
    ref_models.backwarp = torch_backwarp
    return ref_models
