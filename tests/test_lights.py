"""Light sampling tests: pdf consistency (sampled pdf vs pdf_li), solid-angle
integration against analytic values, delta-light conventions."""

import jax
import jax.numpy as jnp
import numpy as np

from kytpu.core import math as km
from kytpu.light import lights as kl

N = 100_000


def _u2(seed, n=N):
    return jax.random.uniform(jax.random.key(seed), (n, 2))


def _rect_lights():
    # unit square at z=2, normal -z (facing the origin)
    p0 = np.array([1.0, 0.0, 2.0])
    p1 = np.array([0.0, 0.0, 2.0])
    p2 = np.array([0.0, 1.0, 2.0])
    p3 = np.array([1.0, 1.0, 2.0])
    n = np.array([0.0, 0.0, -1.0])
    return kl.Lights(
        kinds=(kl.AREA_RECT,), surface_ids=(0,),
        emit=jnp.asarray([[5.0, 5.0, 5.0]]),
        position=jnp.zeros((1, 3)), direction=jnp.zeros((1, 3)),
        p0=jnp.asarray([p0], jnp.float32), p1=jnp.asarray([p1], jnp.float32),
        p2=jnp.asarray([p2], jnp.float32), p3=jnp.asarray([p3], jnp.float32),
        normal=jnp.asarray([n], jnp.float32),
        area=jnp.asarray([1.0]), center=jnp.zeros((1, 3)),
        radius=jnp.zeros((1,)))


def _sphere_lights(center=(0, 0, 5), radius=1.0, emit=3.0):
    return kl.Lights(
        kinds=(kl.AREA_SPHERE,), surface_ids=(0,),
        emit=jnp.full((1, 3), emit),
        position=jnp.zeros((1, 3)), direction=jnp.zeros((1, 3)),
        p0=jnp.zeros((1, 3)), p1=jnp.zeros((1, 3)), p2=jnp.zeros((1, 3)),
        p3=jnp.zeros((1, 3)), normal=jnp.zeros((1, 3)),
        area=jnp.zeros((1,)),
        center=jnp.asarray([center], jnp.float32),
        radius=jnp.asarray([radius], jnp.float32))


def test_point_light():
    lights = kl.Lights(
        kinds=(kl.POINT,), surface_ids=(-1,),
        emit=jnp.asarray([[4.0, 4.0, 4.0]]),
        position=jnp.asarray([[0.0, 0.0, 2.0]]),
        direction=jnp.zeros((1, 3)), p0=jnp.zeros((1, 3)),
        p1=jnp.zeros((1, 3)), p2=jnp.zeros((1, 3)), p3=jnp.zeros((1, 3)),
        normal=jnp.zeros((1, 3)), area=jnp.zeros((1,)),
        center=jnp.zeros((1, 3)), radius=jnp.zeros((1,)))
    p = jnp.zeros((4, 3))
    nrm = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (4, 1))
    s = kl.sample_li(lights, 0, jnp.asarray(10.0), p, nrm, _u2(0, 4))
    assert np.allclose(np.asarray(s.wi), [0, 0, 1], atol=1e-6)
    assert np.allclose(np.asarray(s.pdf), 1.0)
    assert np.allclose(np.asarray(s.li), 1.0)  # I/d^2 = 4/4
    assert np.allclose(np.asarray(
        kl.pdf_li(lights, 0, p, nrm, s.wi)), 0.0)


def test_rect_solid_angle_integration():
    """E[1/pdf] over light samples = subtended solid angle; cross-check
    against a brute-force numerical integral."""
    lights = _rect_lights()
    shade = jnp.tile(jnp.asarray([0.5, 0.5, 0.0]), (N, 1))
    nrm = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (N, 1))
    s = kl.sample_li(lights, 0, jnp.asarray(10.0), shade, nrm, _u2(1))
    pdf = np.asarray(s.pdf)
    assert (pdf > 0).all()
    est = float(np.mean(1.0 / pdf))
    # brute force: solid angle of unit square at distance 2, from its center
    # axis: integrate cos/r^2 over the square
    gx, gy = np.meshgrid(np.linspace(0, 1, 400), np.linspace(0, 1, 400))
    dx, dy = gx - 0.5, gy - 0.5
    r2 = dx**2 + dy**2 + 4.0
    omega = float(np.sum((2.0 / r2**1.5)) * (1.0 / 400) ** 2)
    assert np.isclose(est, omega, rtol=2e-2)


def test_rect_pdf_li_matches_sampled_pdf():
    lights = _rect_lights()
    n = 20_000
    shade = jnp.tile(jnp.asarray([0.5, 0.5, 0.0]), (n, 1))
    nrm = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
    s = kl.sample_li(lights, 0, jnp.asarray(10.0), shade, nrm, _u2(2, n))
    pdf2 = np.asarray(kl.pdf_li(lights, 0, shade, nrm, s.wi))
    assert np.allclose(pdf2, np.asarray(s.pdf), rtol=2e-3, atol=1e-4)


def test_rect_one_sided():
    """Radiance only emitted on the normal side (ky.cpp:2957-2960)."""
    lights = _rect_lights()
    behind = jnp.tile(jnp.asarray([0.5, 0.5, 4.0]), (100, 1))  # behind rect
    nrm = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (100, 1))
    s = kl.sample_li(lights, 0, jnp.asarray(10.0), behind, nrm, _u2(3, 100))
    assert np.all(np.asarray(s.li) == 0.0)


def test_sphere_cone_pdf_consistency():
    lights = _sphere_lights()
    n = 50_000
    shade = jnp.zeros((n, 3))
    nrm = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
    s = kl.sample_li(lights, 0, jnp.asarray(10.0), shade, nrm, _u2(4, n))
    # all sampled dirs inside the cone
    cos_max = np.sqrt(1 - (1.0 / 5.0) ** 2)
    wz = np.asarray(s.wi[:, 2])
    assert wz.min() >= cos_max - 1e-4
    # constant cone pdf
    assert np.allclose(np.asarray(s.pdf),
                       1.0 / (2 * np.pi * (1 - cos_max)), rtol=1e-4)
    # pdf_li agrees
    pdf2 = np.asarray(kl.pdf_li(lights, 0, shade, nrm, s.wi))
    assert np.allclose(pdf2, np.asarray(s.pdf), rtol=1e-4)
    # E[1/pdf] = cone solid angle
    est = float(np.mean(1.0 / np.asarray(s.pdf)))
    assert np.isclose(est, 2 * np.pi * (1 - cos_max), rtol=1e-5)


def test_sphere_sample_positions_on_sphere():
    lights = _sphere_lights()
    n = 10_000
    shade = jnp.zeros((n, 3))
    nrm = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
    s = kl.sample_li(lights, 0, jnp.asarray(10.0), shade, nrm, _u2(5, n))
    d = np.linalg.norm(np.asarray(s.position) - np.array([0, 0, 5.0]), axis=-1)
    assert np.allclose(d, 1.0, atol=1e-4)
    # sampled points on the visible cap face the shade point
    facing = np.asarray(km.dot(
        km.normalize(s.position - jnp.asarray([[0.0, 0.0, 5.0]])), -s.wi))
    assert (facing > -1e-4).all()


def test_sphere_tiny_angle_taylor():
    """A far-away sphere exercises the Taylor fallback without NaNs."""
    lights = _sphere_lights(center=(0, 0, 1000.0), radius=1.0)
    n = 1000
    shade = jnp.zeros((n, 3))
    nrm = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
    s = kl.sample_li(lights, 0, jnp.asarray(2000.0), shade, nrm, _u2(6, n))
    assert np.isfinite(np.asarray(s.pdf)).all()
    assert np.isfinite(np.asarray(s.wi)).all()
    assert (np.asarray(s.pdf) > 0).all()


def test_env_light_pdf():
    lights = kl.Lights(
        kinds=(kl.ENV,), surface_ids=(-1,),
        emit=jnp.asarray([[0.5, 0.6, 0.7]]),
        position=jnp.zeros((1, 3)), direction=jnp.zeros((1, 3)),
        p0=jnp.zeros((1, 3)), p1=jnp.zeros((1, 3)), p2=jnp.zeros((1, 3)),
        p3=jnp.zeros((1, 3)), normal=jnp.zeros((1, 3)),
        area=jnp.zeros((1,)), center=jnp.zeros((1, 3)),
        radius=jnp.zeros((1,)))
    shade = jnp.zeros((N, 3))
    nrm = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (N, 1))
    s = kl.sample_li(lights, 0, jnp.asarray(10.0), shade, nrm, _u2(7))
    # sample_Li and pdf_Li must agree (needed for consistent MIS weights)
    pdf2 = np.asarray(kl.pdf_li(lights, 0, shade, nrm, s.wi))
    assert np.allclose(pdf2, np.asarray(s.pdf), rtol=1e-5)
    # Replicated reference QUIRK (ky.cpp:3029-3035): directions are drawn
    # uniformly on the sphere (density 1/4pi) but the reported pdf is the
    # angle-space density 1/(2 pi^2 sin(theta)) — they disagree, so
    # E[1/pdf] = (1/4pi) * integral of 2 pi^2 sin(theta) domega = pi^3/2,
    # NOT the 4pi an internally-consistent estimator would give.
    est = float(np.mean(1.0 / np.maximum(np.asarray(s.pdf), 1e-12)))
    assert np.isclose(est, np.pi ** 3 / 2, rtol=2e-2)


def test_direction_light():
    lights = kl.Lights(
        kinds=(kl.DIRECTION,), surface_ids=(-1,),
        emit=jnp.asarray([[10.0, 4.0, 0.0]]),
        position=jnp.zeros((1, 3)),
        direction=km.normalize(jnp.asarray([[-1.0, -1.5, -1.0]])),
        p0=jnp.zeros((1, 3)), p1=jnp.zeros((1, 3)), p2=jnp.zeros((1, 3)),
        p3=jnp.zeros((1, 3)), normal=jnp.zeros((1, 3)),
        area=jnp.zeros((1,)), center=jnp.zeros((1, 3)),
        radius=jnp.zeros((1,)))
    p = jnp.zeros((3, 3))
    nrm = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (3, 1))
    s = kl.sample_li(lights, 0, jnp.asarray(7.0), p, nrm, _u2(8, 3))
    wi = np.asarray(s.wi[0])
    assert np.allclose(wi, -np.asarray(lights.direction[0]), atol=1e-6)
    assert np.allclose(np.linalg.norm(np.asarray(s.position[0])), 14.0,
                       atol=1e-4)
    assert np.allclose(np.asarray(s.li[0]), [10, 4, 0])
