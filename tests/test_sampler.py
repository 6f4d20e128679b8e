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
