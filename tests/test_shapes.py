"""Geometry tests: analytic ray-shape hits, closest-hit selection, normals,
occlusion, and the reference's orientation quirks (SURVEY.md §7 step 2)."""

import jax.numpy as jnp
import numpy as np

from kytpu.core import math as km
from kytpu.scene import shapes as ks


def _geom(**kw):
    b = ks.GeometryBuilder()
    for fn, args in kw.get("adds", []):
        getattr(b, fn)(*args)
    return b


def _rays(origins, dirs):
    o = jnp.asarray(origins, jnp.float32)
    d = km.normalize(jnp.asarray(dirs, jnp.float32))
    return o, d, jnp.full((o.shape[0],), jnp.inf, jnp.float32)


def test_sphere_hit_analytic():
    b = ks.GeometryBuilder()
    b.add_sphere((0, 0, 5), 1.0)
    g, _ = b.build()
    o, d, tm = _rays([[0, 0, 0], [0, 0, 0], [3, 0, 0]],
                     [[0, 0, 1], [0, 0, -1], [0, 0, 1]])
    t, acc = ks.intersect_sphere(g, o, d, tm)
    assert bool(acc[0, 0]) and np.isclose(float(t[0, 0]), 4.0, atol=1e-5)
    assert not bool(acc[1, 0])
    assert not bool(acc[2, 0])


def test_sphere_inside_far_root():
    b = ks.GeometryBuilder()
    b.add_sphere((0, 0, 0), 2.0)
    g, _ = b.build()
    o, d, tm = _rays([[0, 0, 0]], [[1, 0, 0]])
    t, acc = ks.intersect_sphere(g, o, d, tm)
    assert bool(acc[0, 0]) and np.isclose(float(t[0, 0]), 2.0, atol=1e-5)


def test_sphere_huge_radius_stability():
    """smallpt-style 1e3-scale walls must not self-shadow in float32."""
    r = 1000.0
    b = ks.GeometryBuilder()
    b.add_sphere((0, 0, -r + 1.0), r)  # surface passes through z=1
    g, _ = b.build()
    o, d, tm = _rays([[0, 0, 0]], [[0, 0, 1]])
    t, acc = ks.intersect_sphere(g, o, d, tm)
    assert bool(acc[0, 0])
    assert np.isclose(float(t[0, 0]), 1.0, atol=1e-2)


def test_triangle_hit_and_miss():
    b = ks.GeometryBuilder()
    b.add_triangle((0, 0, 0), (1, 0, 0), (0, 1, 0))
    g, _ = b.build()
    o, d, tm = _rays([[0.2, 0.2, 1], [0.9, 0.9, 1], [0.2, 0.2, 1]],
                     [[0, 0, -1], [0, 0, -1], [0, 0, 1]])
    t, acc = ks.intersect_planar(g, o, d, tm)
    assert bool(acc[0, 0]) and np.isclose(float(t[0, 0]), 1.0, atol=1e-5)
    assert not bool(acc[1, 0])  # outside the hypotenuse
    assert not bool(acc[2, 0])  # points away


def test_triangle_hit_from_both_sides():
    b = ks.GeometryBuilder()
    b.add_triangle((0, 0, 0), (1, 0, 0), (0, 1, 0))
    g, _ = b.build()
    o, d, tm = _rays([[0.2, 0.2, -1]], [[0, 0, 1]])
    _, acc = ks.intersect_planar(g, o, d, tm)
    assert bool(acc[0, 0])  # sign test accepts the all-negative case


def test_rectangle_hit_and_normal_flip():
    b = ks.GeometryBuilder()
    b.add_rectangle((0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0))
    g, ids = b.build()
    # canonical normal is +z (cross of edges)
    assert np.allclose(np.asarray(g.pl_normal[0]), [0, 0, 1])
    o, d, tm = _rays([[0.5, 0.5, 1], [0.5, 0.5, -1]],
                     [[0, 0, -1], [0, 0, 1]])
    t, acc = ks.intersect_planar(g, o, d, tm)
    assert bool(acc[0, 0]) and bool(acc[1, 0])
    # rectangle normal flips toward the incoming ray (ky.cpp:1289)
    tb, sid, valid = ks.closest_hit(g, o, d, tm)
    pos = o + tb[:, None] * d
    n = np.asarray(ks.surface_normal(g, sid, pos, d))
    assert np.allclose(n[0], [0, 0, 1], atol=1e-6)
    assert np.allclose(n[1], [0, 0, -1], atol=1e-6)


def test_rectangle_corner_cases():
    b = ks.GeometryBuilder()
    b.add_rectangle((0, 0, 0), (2, 0, 0), (2, 1, 0), (0, 1, 0))
    g, _ = b.build()
    o, d, tm = _rays([[1.99, 0.99, 1], [2.01, 0.5, 1]],
                     [[0, 0, -1], [0, 0, -1]])
    _, acc = ks.intersect_planar(g, o, d, tm)
    assert bool(acc[0, 0])
    assert not bool(acc[1, 0])


def test_disk_hit():
    b = ks.GeometryBuilder()
    b.add_disk((0, 0, 2), (0, 0, 1), 0.5)
    g, _ = b.build()
    o, d, tm = _rays([[0.3, 0, 0], [0.6, 0, 0], [0.3, 0, 0]],
                     [[0, 0, 1], [0, 0, 1], [1, 0, 0]])
    t, acc = ks.intersect_planar(g, o, d, tm)
    assert bool(acc[0, 0]) and np.isclose(float(t[0, 0]), 2.0, atol=1e-5)
    assert not bool(acc[1, 0])  # outside radius
    assert not bool(acc[2, 0])  # parallel


def test_closest_hit_across_blocks():
    b = ks.GeometryBuilder()
    rect = b.add_rectangle((-1, -1, 3), (1, -1, 3), (1, 1, 3), (-1, 1, 3))
    sph = b.add_sphere((0, 0, 5), 1.0)
    g, ids = b.build()
    o, d, tm = _rays([[0, 0, 0], [2, 2, 0]], [[0, 0, 1], [0, 0, 1]])
    t, sid, valid = ks.closest_hit(g, o, d, tm)
    assert bool(valid[0]) and int(sid[0]) == ids[rect]
    assert np.isclose(float(t[0]), 3.0, atol=1e-5)
    assert not bool(valid[1])
    # remove the rect occluder by shrinking tmax below it: nothing hits
    t2, sid2, valid2 = ks.closest_hit(g, o, d, jnp.full((2,), 2.0))
    assert not bool(valid2[0])


def test_epsilon_rejects_self_hit():
    b = ks.GeometryBuilder()
    b.add_rectangle((-1, -1, 0), (1, -1, 0), (1, 1, 0), (-1, 1, 0))
    g, _ = b.build()
    # origin exactly on the plane, ray leaving along it -> no hit
    o, d, tm = _rays([[0, 0, 1e-4]], [[0, 0, 1]])
    _, acc = ks.intersect_planar(g, o, d, tm)
    assert not bool(acc[0, 0])


def test_any_hit_matches_closest():
    b = ks.GeometryBuilder()
    b.add_sphere((0, 0, 3), 1.0)
    b.add_rectangle((-5, -5, 10), (5, -5, 10), (5, 5, 10), (-5, 5, 10))
    g, _ = b.build()
    o, d, tm = _rays([[0, 0, 0], [3, 3, 0]], [[0, 0, 1], [0, 0, 1]])
    ah = np.asarray(ks.any_hit(g, o, d, tm))
    _, _, valid = ks.closest_hit(g, o, d, tm)
    assert (ah == np.asarray(valid)).all()


def test_areas():
    b = ks.GeometryBuilder()
    b.add_triangle((0, 0, 0), (2, 0, 0), (0, 2, 0))
    b.add_rectangle((0, 0, 0), (2, 0, 0), (2, 1, 0), (0, 1, 0))
    b.add_disk((0, 0, 0), (0, 0, 1), 2.0)
    b.add_sphere((0, 0, 0), 3.0)
    g, _ = b.build()
    assert np.isclose(float(g.pl_area[0]), 2.0)
    assert np.isclose(float(g.pl_area[1]), 2.0)  # parallelogram magnitude
    assert np.isclose(float(g.pl_area[2]), np.pi * 4, rtol=1e-6)
    assert np.isclose(float(g.sp_area[0]), 4 * np.pi * 9, rtol=1e-6)


def test_bounding_sphere():
    b = ks.GeometryBuilder()
    b.add_sphere((1, 0, 0), 1.0)
    b.add_sphere((-1, 0, 0), 1.0)
    c, r = b.bounding_sphere()
    assert np.allclose(c, [0, 0, 0], atol=1e-6)
    assert np.isclose(r, np.sqrt(4 + 1 + 1), atol=1e-5)
