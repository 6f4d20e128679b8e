"""Unit tests for core math: warps vs their pdfs, Fresnel, MIS, refraction.

The reference has no tests; these systematize SURVEY.md §4's oracles:
sample/pdf consistency via Monte-Carlo integration against analytic values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kytpu.core import math as km
from kytpu.core import frame as kframe

N = 200_000


def _u2(seed=0, n=N):
    return jax.random.uniform(jax.random.key(seed), (n, 2))


def test_constants():
    assert np.isclose(km.INV_PI * np.pi, 1.0)
    assert np.isclose(km.INV_2PI * 2 * np.pi, 1.0)
    assert np.isclose(km.INV_4PI * 4 * np.pi, 1.0)


def test_uniform_disk_sample():
    p = np.asarray(km.uniform_disk_sample(_u2()))
    r = np.linalg.norm(p, axis=-1)
    assert r.max() <= 1.0 + 1e-5
    # uniform density: mean radius = 2/3, mean r^2 = 1/2
    assert np.isclose(r.mean(), 2 / 3, atol=2e-3)
    assert np.isclose((r ** 2).mean(), 0.5, atol=2e-3)


def test_concentric_disk_sample():
    p = np.asarray(km.concentric_disk_sample(_u2(1)))
    r = np.linalg.norm(p, axis=-1)
    assert r.max() <= 1.0 + 1e-5
    assert np.isclose(r.mean(), 2 / 3, atol=2e-3)
    assert np.allclose(p.mean(axis=0), 0.0, atol=3e-3)
    # degenerate input maps to origin
    z = km.concentric_disk_sample(jnp.full((1, 2), 0.5))
    assert np.allclose(z, 0.0)


@pytest.mark.parametrize("name,sampler,pdf_fn", [
    ("cosine_hemisphere", km.cosine_hemisphere_sample,
     lambda w: km.cosine_hemisphere_pdf(w[..., 2])),
    ("uniform_hemisphere", km.uniform_hemisphere_sample,
     lambda w: jnp.full(w.shape[:-1], km.uniform_hemisphere_pdf())),
    ("uniform_sphere", km.uniform_sphere_sample,
     lambda w: jnp.full(w.shape[:-1], km.uniform_sphere_pdf())),
])
def test_warp_pdf_consistency(name, sampler, pdf_fn):
    """E[g(w)/pdf(w)] must equal the integral of g over the domain."""
    w = sampler(_u2(2))
    assert np.allclose(np.linalg.norm(np.asarray(w), axis=-1), 1.0, atol=1e-4)
    pdf = np.asarray(pdf_fn(w))
    # integrate g = 1 over the support: expect the solid angle
    est = float(np.mean(1.0 / pdf))
    target = {"cosine_hemisphere": 2 * np.pi,  # int over hemisphere of 1
              "uniform_hemisphere": 2 * np.pi,
              "uniform_sphere": 4 * np.pi}[name]
    # cosine warp: E[1/pdf] = int 1 dw = 2pi as well
    assert np.isclose(est, target, rtol=2e-2)


def test_cosine_hemisphere_moment():
    """E[cos(theta)/pdf] = integral of cos over hemisphere = pi."""
    w = km.cosine_hemisphere_sample(_u2(3))
    est = float(np.mean(np.asarray(w[..., 2]) /
                        np.asarray(km.cosine_hemisphere_pdf(w[..., 2]))))
    assert np.isclose(est, np.pi, rtol=1e-2)


def test_uniform_cone():
    cos_max = 0.8
    w = km.uniform_cone_sample(_u2(4), cos_max)
    wz = np.asarray(w[..., 2])
    assert wz.min() >= cos_max - 1e-5
    pdf = km.uniform_cone_pdf(cos_max)
    est = float(np.mean(np.ones_like(wz) / pdf))
    assert np.isclose(est, 2 * np.pi * (1 - cos_max), rtol=1e-6)
    # uniform in cos_theta over [cos_max, 1]
    assert np.isclose(wz.mean(), (1 + cos_max) / 2, atol=1e-3)


def test_uniform_triangle():
    b = np.asarray(km.uniform_triangle_sample(_u2(5)))
    assert (b >= 0).all() and (b.sum(-1) <= 1 + 1e-5).all()
    # barycentric means are 1/3
    assert np.allclose(b.mean(axis=0), 1 / 3, atol=2e-3)


def test_mis_heuristics():
    assert np.isclose(float(km.balance_heuristic(1, 2.0, 1, 6.0)), 0.25)
    assert np.isclose(float(km.power_heuristic(1, 1.0, 1, 3.0)), 0.1)
    # weights sum to one
    a = float(km.balance_heuristic(1, 0.7, 1, 0.2))
    b = float(km.balance_heuristic(1, 0.2, 1, 0.7))
    assert np.isclose(a + b, 1.0)


def test_reflect():
    wo = km.normalize(jnp.asarray([[0.3, -0.2, 0.9]]))
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    r = km.reflect(wo, n)
    assert np.allclose(r, [[-0.3 / np.linalg.norm([0.3, -0.2, 0.9]),
                            0.2 / np.linalg.norm([0.3, -0.2, 0.9]),
                            0.9 / np.linalg.norm([0.3, -0.2, 0.9])]], atol=1e-6)


def test_refract_snell():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    wi = km.normalize(jnp.asarray([[0.5, 0.0, 0.8]]))
    eta = 1.0 / 1.5
    wt, ok = km.refract(wi, n, eta)
    assert bool(ok[0])
    wt = np.asarray(wt[0])
    sin_i = np.sqrt(1 - np.asarray(wi)[0, 2] ** 2)
    sin_t = np.sqrt(wt[0] ** 2 + wt[1] ** 2) / np.linalg.norm(wt)
    assert np.isclose(sin_t, eta * sin_i, atol=1e-6)
    assert wt[2] < 0  # transmitted to the other side


def test_refract_tir():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    wi = km.normalize(jnp.asarray([[0.95, 0.0, 0.3]]))  # grazing, dense->thin
    _, ok = km.refract(wi, n, 1.5)
    assert not bool(ok[0])


def test_fresnel_dielectric():
    # normal incidence: ((n1-n2)/(n1+n2))^2
    f0 = float(km.fresnel_dielectric(jnp.asarray([1.0]), 1.0, 1.5)[0])
    assert np.isclose(f0, ((1.5 - 1) / (1.5 + 1)) ** 2, atol=1e-6)
    # grazing -> 1
    fg = float(km.fresnel_dielectric(jnp.asarray([1e-4]), 1.0, 1.5)[0])
    assert fg > 0.98
    # symmetric in the medium swap with negated cosine
    a = float(km.fresnel_dielectric(jnp.asarray([0.6]), 1.0, 1.5)[0])
    b = float(km.fresnel_dielectric(jnp.asarray([-0.6]), 1.5, 1.0)[0])
    assert np.isclose(a, b, atol=1e-6)
    # TIR from the dense side
    t = float(km.fresnel_dielectric(jnp.asarray([-0.2]), 1.0, 1.5)[0])
    assert t == 1.0


def test_frame_roundtrip():
    key = jax.random.key(7)
    n = km.normalize(jax.random.normal(key, (1000, 3)))
    s, t, nn = kframe.make_frame(n)
    # orthonormality
    assert np.allclose(np.asarray(km.dot(s, t)), 0, atol=1e-5)
    assert np.allclose(np.asarray(km.dot(s, nn)), 0, atol=1e-5)
    assert np.allclose(np.asarray(km.length(s)), 1, atol=1e-5)
    v = km.normalize(jax.random.normal(jax.random.key(8), (1000, 3)))
    back = kframe.to_world(s, t, nn, kframe.to_local(s, t, nn, v))
    assert np.allclose(np.asarray(back), np.asarray(v), atol=1e-5)
    # local z == normal
    assert np.allclose(np.asarray(kframe.to_local(s, t, nn, n)),
                       np.tile([0, 0, 1.0], (1000, 1)), atol=1e-5)


def test_spherical_roundtrip():
    w = km.uniform_sphere_sample(_u2(9, 1000))
    theta = km.spherical_theta(w)
    phi = km.spherical_phi(w)
    back = km.spherical_to_direction(jnp.sin(theta), jnp.cos(theta), phi)
    assert np.allclose(np.asarray(back), np.asarray(w), atol=1e-4)


def test_offset_ray_origin():
    p = jnp.zeros((2, 3))
    n = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (2, 1))
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    o = np.asarray(km.offset_ray_origin(p, n, d))
    assert np.isclose(o[0, 2], km.RAY_OFFSET)
    assert np.isclose(o[1, 2], -km.RAY_OFFSET)
