"""The production single-sample-MIS integrator must converge to the same
image as the reference-exact both_mis formulation (same expectation, see
kytpu/integrator/fast.py) and stay differentiable."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kytpu.integrator.fast import FastConfig, li_path_fast
from kytpu.integrator.path import PathConfig
from kytpu.integrator.render import render
from kytpu.scene import builders


def _downsample(img, f):
    h, w, _ = np.asarray(img).shape
    return np.asarray(img).reshape(h // f, f, w // f, f, 3).mean(axis=(1, 3))


@pytest.mark.slow
@pytest.mark.parametrize("make_scene", [
    lambda: builders.cornell_box(width=32, height=32),
    lambda: builders.cornell_box(
        {builders.LARGE_MIRROR_SPHERE, builders.LIGHT_AREA},
        width=32, height=32),
    lambda: builders.veach_mis(width=32, height=20),
])
def test_fast_matches_reference_estimator(make_scene):
    scene = make_scene()
    ref = render(scene, spp=96, seed=3,
                 cfg=PathConfig(max_depth=4, strategy="both_mis"))
    fast = render(scene, spp=96, seed=11,
                  cfg=FastConfig(max_depth=4), mode="fast")
    a, b = _downsample(ref, 4), _downsample(fast, 4)
    err = np.abs(a - b).mean()
    assert err < 0.025, f"mean abs err {err:.4f}"


def test_fast_sobol_converges_to_random():
    """fast + Owen-Sobol estimates the same integral as fast + random
    (measured 2026-08-20: identical means to 0.1% at 4096 spp; 6.5x lower
    MSE at 32 spp on the Cornell scene — BASELINE.md)."""
    scene = builders.cornell_box(width=16, height=16)
    cfg_r = FastConfig(max_depth=3)
    cfg_s = FastConfig(max_depth=3, sampler="sobol")
    rnd = render(scene, spp=64, seed=3, cfg=cfg_r, mode="fast")
    sob = render(scene, spp=64, seed=11, cfg=cfg_s, mode="fast")
    a, b = _downsample(rnd, 4), _downsample(sob, 4)
    err = np.abs(a - b).mean()
    assert err < 0.03, f"mean abs err {err:.4f}"
    # a fixed pixel's samples walk one stratified point set: two seeds give
    # different scrambles but the same estimate up to noise
    sob2 = render(scene, spp=64, seed=12, cfg=cfg_s, mode="fast")
    assert np.abs(_downsample(sob, 4) - _downsample(sob2, 4)).mean() < 0.03


def test_fast_env_scene():
    flags = builders.BOTH_SMALL_SPHERES | {builders.LIGHT_ENVIRONMENT}
    scene = builders.cornell_box(flags, width=16, height=16)
    ref = render(scene, spp=64, seed=3,
                 cfg=PathConfig(max_depth=3, strategy="both_mis"))
    fast = render(scene, spp=64, seed=11,
                  cfg=FastConfig(max_depth=3))
    assert abs(float(np.asarray(ref).mean())
               - float(np.asarray(fast).mean())) < 0.03


def test_fast_point_light():
    # Compare against strategy="light", NOT "both_mis": the reference's
    # both_mis halves delta-light contributions (0.5*Lb + 0.5*Ll with Lb
    # identically 0 for delta lights, ky.cpp:4076-4088 + 3889-3892), a
    # quirk path.py replicates but the production integrator corrects.
    flags = builders.BOTH_SMALL_SPHERES | {builders.LIGHT_POINT}
    scene = builders.cornell_box(flags, width=16, height=16)
    ref = render(scene, spp=32, seed=3,
                 cfg=PathConfig(max_depth=3, strategy="light"))
    fast = render(scene, spp=32, seed=11, cfg=FastConfig(max_depth=3))
    assert abs(float(np.asarray(ref).mean())
               - float(np.asarray(fast).mean())) < 0.03


def test_fast_differentiable():
    scene = builders.cornell_box(width=8, height=8)
    from kytpu.diff.params import get_params, set_params
    from kytpu.diff.inverse import _lane_ids
    from kytpu.integrator.render import trace_lanes
    cfg = FastConfig(max_depth=2)
    key = jax.random.key(0)
    px, py, pid, sid = _lane_ids(8, 8, 2)

    def f(p):
        sc = set_params(scene, p)
        out = trace_lanes(sc, key, px, py, pid, sid, cfg, "fast", None)
        return jnp.mean(out)

    g = jax.grad(f)(get_params(scene))
    total = sum(float(jnp.abs(v).sum()) for v in g.values())
    assert np.isfinite(total) and total > 0.0
