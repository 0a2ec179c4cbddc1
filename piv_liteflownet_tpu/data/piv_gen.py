"""Synthetic PIV particle-image generator — vectorized, on-device.

A corrected, TPU-native reimplementation of the reference's generator
(reference ``src/particle_image_generator.py:9-86``, which is broken as-is:
missing import at ``:6``, undefined ``u, v`` at ``:84``, arg mismatch at
``:75``). Physics preserved:

- particles uniform in (x, y, z) with diameter d;
- peak intensity ``I = I0 * exp(-z^2 / lt^2)`` from laser-sheet thickness
  (reference ``:51``);
- image = sum of per-particle Gaussian spots;
- the second frame advects particles by the flow field bilinearly
  interpolated at each particle position (reference ``:60-86``).

TPU design: a particle's Gaussian spot is separable, so the image is ONE
matmul: ``image = (Gy * I)^T @ Gx`` with ``Gy [N, H]``, ``Gx [N, W]`` —
the splatting runs on the MXU instead of a per-particle host loop. Fully
jittable and batchable; streams straight into the trainer without host
round-trips.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ParticleImageGen:
    image_size: Tuple[int, int] = (256, 256)
    ppp: float = 0.02  # particles per pixel
    d_mean: float = 2.5  # mean particle image diameter (px)
    d_std: float = 0.4
    laser_thickness: float = 0.25  # as fraction of unit z-range
    peak_intensity: float = 240.0 / 255.0  # images normalized to [0,1]

    @property
    def n_particles(self) -> int:
        return max(1, int(self.ppp * self.image_size[0] * self.image_size[1]))

    # ------------------------------------------------------------------
    def sample_particles(self, key: jax.Array):
        """Uniform (x, y, z, d) particle population (reference ``:24-40``)."""
        h, w = self.image_size
        kx, ky, kz, kd = jax.random.split(key, 4)
        n = self.n_particles
        # margin so particles can advect in without popping
        x = jax.random.uniform(kx, (n,), minval=-8.0, maxval=w + 8.0)
        y = jax.random.uniform(ky, (n,), minval=-8.0, maxval=h + 8.0)
        z = jax.random.uniform(kz, (n,), minval=-1.0, maxval=1.0)
        d = jnp.clip(self.d_mean + self.d_std * jax.random.normal(kd, (n,)), 1.0, None)
        return x, y, z, d

    def render(self, x, y, z, d) -> jax.Array:
        """Splat particles to an [H, W] image via separable-Gaussian matmul."""
        h, w = self.image_size
        inten = self.peak_intensity * jnp.exp(-(z ** 2) / (self.laser_thickness ** 2))
        # Gaussian spot: exp(-8 r^2 / d^2) (PIV convention: d = e^-2 diameter)
        inv = 8.0 / (d ** 2)
        xs = jnp.arange(w, dtype=jnp.float32)
        ys = jnp.arange(h, dtype=jnp.float32)
        gx = jnp.exp(-((xs[None, :] - x[:, None]) ** 2) * inv[:, None])  # [N, W]
        gy = jnp.exp(-((ys[None, :] - y[:, None]) ** 2) * inv[:, None])  # [N, H]
        img = jnp.einsum("ph,pw->hw", gy * inten[:, None], gx,
                         precision=jax.lax.Precision.DEFAULT)
        return jnp.clip(img, 0.0, 1.0)

    def _interp_flow(self, flow: jax.Array, x: jax.Array, y: jax.Array):
        """Bilinear flow sample at particle positions (edge-clamped)."""
        h, w = flow.shape[0], flow.shape[1]
        xc = jnp.clip(x, 0.0, w - 1.0)
        yc = jnp.clip(y, 0.0, h - 1.0)
        x0 = jnp.floor(xc).astype(jnp.int32)
        y0 = jnp.floor(yc).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, w - 1)
        y1 = jnp.minimum(y0 + 1, h - 1)
        wx = xc - x0
        wy = yc - y0
        f = flow.reshape(h * w, 2)

        def g(yy, xx):
            return jnp.take(f, yy * w + xx, axis=0)

        return (
            g(y0, x0) * ((1 - wx) * (1 - wy))[:, None]
            + g(y0, x1) * (wx * (1 - wy))[:, None]
            + g(y1, x0) * ((1 - wx) * wy)[:, None]
            + g(y1, x1) * (wx * wy)[:, None]
        )

    @functools.partial(jax.jit, static_argnums=0)
    def generate_pair(self, key: jax.Array, flow: jax.Array):
        """One (img1, img2) pair advected by ``flow`` [H, W, 2].

        Returns float32 ([H,W,3], [H,W,3]) grayscale replicated to RGB
        (PIV cameras are mono; the model expects 3 channels).
        """
        x, y, z, d = self.sample_particles(key)
        img1 = self.render(x, y, z, d)
        disp = self._interp_flow(flow, x, y)
        img2 = self.render(x + disp[:, 0], y + disp[:, 1], z, d)
        to_rgb = lambda im: jnp.repeat(im[..., None], 3, axis=-1)
        return to_rgb(img1), to_rgb(img2)

    def generate_batch(self, key: jax.Array, flows: jax.Array):
        """Batched pairs for a [B, H, W, 2] flow stack."""
        keys = jax.random.split(key, flows.shape[0])
        return jax.vmap(lambda k, f: self.generate_pair(k, f))(keys, flows)


# ----------------------------------------------------------------- flow fields
def uniform_flow(h: int, w: int, u: float, v: float) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.asarray([u, v], jnp.float32), (h, w, 2))


def vortex_flow(h: int, w: int, strength: float = 3.0, core: float = 0.25) -> jnp.ndarray:
    """Rankine-style vortex centered in the frame."""
    ys, xs = jnp.mgrid[0:h, 0:w]
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    dx = (xs - cx) / (w / 2)
    dy = (ys - cy) / (h / 2)
    r2 = dx ** 2 + dy ** 2 + 1e-6
    scale = strength * jnp.minimum(1.0, r2 / core ** 2) / jnp.sqrt(r2)
    return jnp.stack([-dy * scale, dx * scale], axis=-1).astype(jnp.float32)


def shear_flow(h: int, w: int, strength: float = 4.0) -> jnp.ndarray:
    ys = jnp.linspace(-1, 1, h, dtype=jnp.float32)
    u = strength * ys[:, None] * jnp.ones((h, w), jnp.float32)
    return jnp.stack([u, jnp.zeros_like(u)], axis=-1)


def sine_flow(h: int, w: int, amp: float = 2.5, freq: float = 2.0) -> jnp.ndarray:
    ys, xs = jnp.mgrid[0:h, 0:w]
    u = amp * jnp.sin(2 * jnp.pi * freq * ys / h)
    v = amp * jnp.cos(2 * jnp.pi * freq * xs / w)
    return jnp.stack([u, v], axis=-1).astype(jnp.float32)


FLOW_FIELDS: dict = {
    "uniform": lambda h, w: uniform_flow(h, w, 2.0, -1.0),
    "vortex": vortex_flow,
    "shear": shear_flow,
    "sine": sine_flow,
}


def make_dataset_dir(outdir: str, n: int = 16, size: Tuple[int, int] = (256, 256),
                     seed: int = 0, write_manifest: bool = True) -> None:
    """Write a PIVData-layout directory of synthetic pairs + .flo ground truth
    (for trainer smoke tests and demos)."""
    import json
    import os

    import numpy as np
    from PIL import Image

    from piv_liteflownet_tpu.utils.flow_io import write_flow

    os.makedirs(outdir, exist_ok=True)
    gen = ParticleImageGen(image_size=size)
    names = list(FLOW_FIELDS)
    key = jax.random.PRNGKey(seed)
    entries = []
    for i in range(n):
        fk = FLOW_FIELDS[names[i % len(names)]]
        flow = fk(*size)
        key, sub = jax.random.split(key)
        im1, im2 = gen.generate_pair(sub, flow)
        base = f"sample_{i:04d}"
        for tag, im in (("img1", im1), ("img2", im2)):
            Image.fromarray(np.asarray(im[..., 0] * 255, np.uint8)).save(
                os.path.join(outdir, f"{base}_{tag}.png"))
        write_flow(np.asarray(flow), os.path.join(outdir, f"{base}_flow.flo"))
        entries.append(f"{base}_flow.flo")
    if write_manifest:
        n_train = max(1, int(0.75 * n))
        with open(os.path.join(outdir, "train.json"), "w") as f:
            json.dump(entries[:n_train], f)
        with open(os.path.join(outdir, "val.json"), "w") as f:
            json.dump(entries[n_train:], f)
