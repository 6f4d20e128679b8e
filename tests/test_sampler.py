"""Sampler modes: stratified camera jitter and the debug constant sampler."""

import numpy as np
import pytest

from kytpu.core import rng as krng
from kytpu.integrator.path import PathConfig
from kytpu.integrator.render import render
from kytpu.scene import builders


@pytest.fixture(scope="module")
def scene():
    return builders.cornell_box(width=16, height=16)


def test_stratum_grid():
    assert krng.stratum_grid(16) == (4, 4)
    assert krng.stratum_grid(8) == (2, 4)
    assert krng.stratum_grid(7) == (1, 7)
    assert krng.stratum_grid(1) == (1, 1)


def test_debug_sampler_deterministic(scene):
    """debug_sampler_t semantics (ky.cpp:922-947): every draw is 0.5, so the
    render is identical across seeds."""
    cfg = PathConfig(max_depth=2, sampler="debug")
    a = np.asarray(render(scene, spp=1, seed=1, cfg=cfg))
    b = np.asarray(render(scene, spp=1, seed=999, cfg=cfg))
    np.testing.assert_array_equal(a, b)


def test_stratified_reduces_aov_variance(scene):
    """Stratified camera jitter lowers pixel variance of a geometry-driven
    signal (the position AOV) at equal spp."""
    spp = 16
    imgs_r, imgs_s = [], []
    for seed in (1, 2, 3):
        imgs_r.append(np.asarray(render(
            scene, spp=spp, seed=seed, mode="aov", aov="position",
            cfg=PathConfig(sampler="random"))))
        imgs_s.append(np.asarray(render(
            scene, spp=spp, seed=seed, mode="aov", aov="position",
            cfg=PathConfig(sampler="stratified"))))
    var_r = np.var(np.stack(imgs_r), axis=0).mean()
    var_s = np.var(np.stack(imgs_s), axis=0).mean()
    assert var_s < var_r, (var_s, var_r)


def test_stratified_mean_unbiased(scene):
    """Stratified and random renders agree in expectation."""
    cfg_r = PathConfig(max_depth=2, sampler="random")
    cfg_s = PathConfig(max_depth=2, sampler="stratified")
    a = np.asarray(render(scene, spp=64, seed=3, cfg=cfg_r))
    b = np.asarray(render(scene, spp=64, seed=4, cfg=cfg_s))
    assert abs(a.mean() - b.mean()) < 0.02


def test_owen_sobol_nets():
    """core/lds.py: the first 256 shuffled+scrambled points are a (0,8,2)-net
    — every 16x16 stratum holds exactly one point, every 1D 1/256 stratum
    exactly one — and distinct seeds decorrelate."""
    import jax.numpy as jnp

    from kytpu.core import lds

    idx = jnp.arange(256)
    for s in (7, 1234, 99991):
        seeds = np.random.RandomState(s).randint(
            0, 2**32, size=3, dtype=np.uint32)
        u0, u1 = lds.owen_sobol2(idx, jnp.full(256, seeds[0]),
                                 jnp.full(256, seeds[1]),
                                 jnp.full(256, seeds[2]))
        u0, u1 = np.asarray(u0), np.asarray(u1)
        assert (u0 >= 0).all() and (u0 < 1).all()
        assert (u1 >= 0).all() and (u1 < 1).all()
        h2 = np.histogram2d(u0, u1, bins=16, range=[[0, 1], [0, 1]])[0]
        assert (h2 == 1).all()
        for u in (u0, u1):
            h1 = np.histogram(u, bins=256, range=(0, 1))[0]
            assert (h1 == 1).all()


def test_sobol_reduces_integration_error():
    """Owen-Sobol beats independent uniforms on a smooth 2D integrand by a
    wide margin at 256 points (the whole point of LD sampling)."""
    import jax.numpy as jnp

    from kytpu.core import lds

    rng = np.random.RandomState(5)
    f = lambda a, b: np.cos(2 * np.pi * a) * np.cos(2 * np.pi * b) + a * b
    idx = jnp.arange(256)
    errs_s, errs_r = [], []
    for _ in range(48):
        s3 = rng.randint(0, 2**32, size=3, dtype=np.uint32)
        a, b = lds.owen_sobol2(idx, jnp.full(256, s3[0]),
                               jnp.full(256, s3[1]), jnp.full(256, s3[2]))
        errs_s.append(np.mean(f(np.asarray(a), np.asarray(b))) - 0.25)
        ur = rng.rand(256, 2)
        errs_r.append(np.mean(f(ur[:, 0], ur[:, 1])) - 0.25)
    rmse_s = float(np.sqrt(np.mean(np.square(errs_s))))
    rmse_r = float(np.sqrt(np.mean(np.square(errs_r))))
    assert rmse_s < rmse_r / 3, (rmse_s, rmse_r)


def test_sobol_render_unbiased_and_lower_error(scene):
    """End-to-end sampler="sobol": agrees with the random sampler in
    expectation and tracks the converged image more closely at equal spp."""
    cfg_r = PathConfig(max_depth=2, sampler="random")
    cfg_q = PathConfig(max_depth=2, sampler="sobol")
    ref = np.asarray(render(scene, spp=512, seed=101, cfg=cfg_r))
    errs = {}
    for name, cfg in (("random", cfg_r), ("sobol", cfg_q)):
        imgs = [np.asarray(render(scene, spp=16, seed=s, cfg=cfg))
                for s in (1, 2, 3, 4, 5)]
        assert all(np.isfinite(i).all() for i in imgs)
        assert abs(np.mean(imgs) - ref.mean()) < 0.02
        errs[name] = float(np.mean([np.mean((i - ref) ** 2) for i in imgs]))
    # seed-averaged: LD lanes track the converged image more closely
    # (measured ~25% lower MSE; per-seed it is noisy, hence the averaging)
    assert errs["sobol"] < errs["random"], errs


def test_tent_filter_matches_box_interior():
    """smallpt's 2x2 tent filter (smallpt.cpp:107-118; completes the
    reference's empty filter region, ky.cpp:1525) is a reconstruction
    change, not an estimator change: away from image borders the tent and
    box images agree to ~MC noise (the tent blurs at most +-0.75 px)."""
    import numpy as np
    from kytpu.integrator.render import render
    from kytpu.integrator.path import PathConfig
    from kytpu.scene import builders

    sc = builders.cornell_box(width=32, height=32)
    a = np.asarray(render(sc, spp=16, seed=1, cfg=PathConfig(max_depth=2)))
    t = np.asarray(render(sc, spp=16, seed=1,
                          cfg=PathConfig(max_depth=2, filter="tent")))
    assert np.isfinite(t).all()
    ai, ti = a[2:-2, 2:-2], t[2:-2, 2:-2]
    rel = abs(float(ai.mean()) - float(ti.mean())) / float(ai.mean())
    assert rel < 0.03, rel
