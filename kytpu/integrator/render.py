"""Frame rendering: camera-sample generation, spp batching, film assembly.

Replaces the reference's `integrator_t::render` OpenMP pixel loop
(ky.cpp:3689-3729) with a flat ray wavefront: every (pixel, sample) pair is
one SoA lane; passes are chunked so arbitrarily large (resolution x spp)
renders fit in HBM; the per-pixel mean is clamped to [0,1] at the end exactly
like the reference's film accumulation (clamp01(L), ky.cpp:3726) unless
`clamp=False` (HDR / inverse-rendering paths).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from kytpu.core import rng as krng
from kytpu.integrator import path as kpath
from kytpu.scene import scene as kscene


@functools.partial(jax.jit, static_argnames=("cfg", "mode", "aov"))
def _render_pass(scene, key, px, py, pixel_ids, sample_ids, cfg, mode, aov):
    """One wavefront pass: (n,) lanes of (pixel, sample) pairs -> (n,3)."""
    keys = jax.vmap(
        lambda s, p: jax.random.fold_in(jax.random.fold_in(key, s), p)
    )(sample_ids, pixel_ids)
    k_cam, k_path = krng.split_channels(keys, 2)
    u = krng.uniform2(k_cam)
    p_film = jnp.stack([px + u[:, 0], py + u[:, 1]], axis=-1)
    o, d = kscene.generate_rays(scene.camera, p_film)

    if mode == "aov":
        return kpath.li_aov(scene, o, d, k_path, aov)
    if mode == "direct":
        return kpath.li_direct_lighting(scene, o, d, k_path, cfg)
    return kpath.li_path(scene, o, d, k_path, cfg)


def _render_mean(scene, spp, seed, cfg, mode, aov, rays_per_pass):
    cam = scene.camera
    w, h = cam.width, cam.height
    npix = w * h

    ys, xs = np.divmod(np.arange(npix, dtype=np.int64), w)
    px_all = xs.astype(np.float32)
    py_all = ys.astype(np.float32)

    key = krng.root_key(seed)
    k = max(1, min(spp, rays_per_pass // max(npix, 1)))
    pix_chunk = min(npix, rays_per_pass)

    accum = jnp.zeros((npix, 3), jnp.float32)
    for p0 in range(0, npix, pix_chunk):
        p1 = min(p0 + pix_chunk, npix)
        pc = p1 - p0
        s0 = 0
        while s0 < spp:
            kk = min(k, spp - s0)
            pid = np.tile(np.arange(p0, p1, dtype=np.int32), kk)
            sid = np.repeat(np.arange(s0, s0 + kk, dtype=np.int32), pc)
            px = np.tile(px_all[p0:p1], kk)
            py = np.tile(py_all[p0:p1], kk)
            out = _render_pass(scene, key, jnp.asarray(px), jnp.asarray(py),
                               jnp.asarray(pid), jnp.asarray(sid),
                               cfg, mode, aov)
            accum = accum.at[p0:p1].add(
                out.reshape(kk, pc, 3).sum(axis=0))
            s0 += kk
    mean = accum / float(spp)
    return mean.reshape(h, w, 3)


def render(scene, spp: int = 16, seed: int = 1234,
           cfg: kpath.PathConfig | None = None, mode: str = "path",
           aov: str | None = None, clamp: bool = True,
           rays_per_pass: int = 1 << 20):
    """Render a full frame; returns (H, W, 3) float32.

    mode: "path" (the wavefront path tracer), "direct" (NEE only), or
    "aov" with aov in {"position","normal","basecolor"}.
    `clamp` reproduces the reference's per-pixel clamp01-of-the-mean
    (ky.cpp:3726); disable for HDR output or differentiable use.
    """
    cfg = cfg or kpath.PathConfig()
    img = _render_mean(scene, spp, seed, cfg, mode, aov, rays_per_pass)
    if clamp:
        img = jnp.clip(img, 0.0, 1.0)
    return img


def render_aov(scene, which: str, spp: int = 10, seed: int = 1234, **kw):
    return render(scene, spp=spp, seed=seed, mode="aov", aov=which, **kw)
