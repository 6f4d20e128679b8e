"""Golden / cross-implementation convergence tests (SURVEY.md §4.1).

The fundamental oracle: independent estimators of the same integral must
converge to the same image. Here the kytpu wavefront renderer is checked
against tests/oracle_pt.py — a from-scratch numpy path tracer with a
different architecture (index compaction, python loops, Generator RNG) —
on downsampled renders at matched spp, within Monte Carlo tolerance.
"""

import numpy as np
import pytest

from kytpu.integrator.path import PathConfig
from kytpu.integrator.render import render
from kytpu.scene import builders

from tests import oracle_pt


def _downsample(img, f):
    h, w, _ = img.shape
    return np.asarray(img).reshape(h // f, f, w // f, f, 3).mean(axis=(1, 3))


def _compare(scene, spp, max_depth, strategy, factor=4, tol=0.02):
    cfg = PathConfig(max_depth=max_depth, variant="iteration",
                     strategy=strategy)
    ours = np.asarray(render(scene, spp=spp, seed=3, cfg=cfg))
    ref = oracle_pt.render_oracle(scene, spp=spp, seed=7,
                                  max_depth=max_depth, strategy=strategy)
    a = _downsample(ours, factor)
    b = _downsample(ref, factor)
    err = np.abs(a - b).mean()
    assert err < tol, f"mean abs err {err:.4f} (tol {tol})"
    return err


@pytest.mark.slow
def test_cornell_box_matches_oracle():
    scene = builders.cornell_box(width=32, height=32)
    _compare(scene, spp=96, max_depth=4, strategy="both_mis")


@pytest.mark.slow
def test_cornell_light_strategy_matches_oracle():
    scene = builders.cornell_box(width=32, height=32)
    _compare(scene, spp=96, max_depth=3, strategy="light")


@pytest.mark.slow
def test_cornell_mirror_sphere_matches_oracle():
    flags = {builders.LARGE_MIRROR_SPHERE, builders.LIGHT_AREA}
    scene = builders.cornell_box(flags, width=32, height=32)
    _compare(scene, spp=96, max_depth=4, strategy="both_mis")


@pytest.mark.slow
def test_veach_matches_oracle():
    """Per-TILE comparison on the flagship MIS scene (not just the image
    mean — a wrong-but-energy-conserving MIS weight must fail here).
    Measured floor at these settings (2026-08-20): kytpu-vs-oracle tile
    error mean 0.0084 / max 0.057 vs a kytpu-vs-kytpu different-seed noise
    floor of mean 0.0082 / max 0.063 — the bounds below are ~2x floor."""
    scene = builders.veach_mis(width=48, height=28)
    cfg = PathConfig(max_depth=3, variant="iteration", strategy="both_mis")
    ours = np.asarray(render(scene, spp=64, seed=3, cfg=cfg))
    ref = oracle_pt.render_oracle(scene, spp=64, seed=7, max_depth=3,
                                  strategy="both_mis")
    a = _downsample(ours, 4)
    b = _downsample(ref, 4)
    d = np.abs(a - b)
    assert d.mean() < 0.02, f"tile mean err {d.mean():.4f}"
    assert d.max() < 0.12, f"tile max err {d.max():.4f}"


def test_random_spheres_scene_scale():
    """random_spheres (beyond-parity scene-scale factory): both jnp engines
    agree on a 80-sphere scene — the O(N) SoA sweep stays correct at scene
    sizes far past the reference's ~16 surfaces."""
    import jax
    import numpy as np
    from kytpu.integrator.fast import FastConfig
    from kytpu.integrator.path import PathConfig
    from kytpu.integrator.render import render
    from kytpu.scene import builders

    sc = builders.random_spheres(n=80, width=24, height=24, seed=3)
    assert sc.geometry.n_surfaces > 60
    a = np.asarray(render(sc, spp=24, seed=1, engine="fast",
                          cfg=FastConfig(max_depth=3)))
    b = np.asarray(render(sc, spp=24, seed=2, engine="path",
                          cfg=PathConfig(max_depth=3,
                                         strategy="both_mis")))
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert a.mean() > 0.02 and b.mean() > 0.02
    # agree to within MC noise on 4x-downsampled tiles
    d4 = lambda x: x.reshape(6, 4, 6, 4, 3).mean(axis=(1, 3))  # noqa: E731
    err = np.abs(d4(a) - d4(b)).mean()
    assert err < 0.05, err
