"""Triangle-mesh ingestion (scene/mesh.py + builders.mesh_scene).

The reference has no mesh path (triangles are placed one at a time,
ky.cpp:1165-1242); these tests pin the beyond-parity generators/parser and
prove meshes flow through the scene sweeps and the renderer.
"""

import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kytpu.scene import builders, mesh
from kytpu.scene import scene as kscene


def _edge_counts(faces):
    from collections import Counter
    c = Counter()
    for a, b, d in faces:
        for u, v in ((a, b), (b, d), (d, a)):
            c[(min(u, v), max(u, v))] += 1
    return c


class TestIcosphere:
    def test_counts(self):
        for s in range(3):
            v, f = mesh.icosphere(s)
            assert f.shape == (20 * 4 ** s, 3)
            assert v.shape == (10 * 4 ** s + 2, 3)

    def test_watertight(self):
        _, f = mesh.icosphere(2)
        assert set(_edge_counts(f).values()) == {2}

    def test_on_sphere_and_outward(self):
        v, f = mesh.icosphere(2, center=(1.0, -2.0, 3.0), radius=2.5)
        r = np.linalg.norm(v - np.array([1.0, -2.0, 3.0]), axis=-1)
        np.testing.assert_allclose(r, 2.5, rtol=1e-12)
        tri = v[f]
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        centroid = tri.mean(axis=1) - np.array([1.0, -2.0, 3.0])
        assert (np.einsum("fi,fi->f", n, centroid) > 0).all()


class TestTorus:
    def test_watertight_and_counts(self):
        v, f = mesh.torus(nu=16, nv=9)
        assert v.shape == (16 * 9, 3)
        assert f.shape == (2 * 16 * 9, 3)
        assert set(_edge_counts(f).values()) == {2}

    def test_outward_winding(self):
        # analytic normal at each face centroid (projected back to the
        # torus) must align with the face normal for a fine mesh
        R, r = 1.0, 0.3
        v, f = mesh.torus(R, r, nu=48, nv=24)
        tri = v[f]
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        cen = tri.mean(axis=1)
        ring = cen.copy()
        ring[:, 1] = 0.0
        ring *= R / np.linalg.norm(ring, axis=-1, keepdims=True)
        analytic = cen - ring
        dots = np.einsum("fi,fi->f", n, analytic)
        assert (dots > 0).all()


class TestLoadObj:
    def test_parses_slash_forms_and_fans(self):
        text = textwrap.dedent("""\
            # quad + tri with vt/vn indices
            v 0 0 0
            v 1 0 0
            v 1 1 0
            v 0 1 0
            v 2 0 0
            f 1/1/1 2/2/1 3/3/1 4/4/1
            f 2//1 5//1 3//1
        """)
        v, f = mesh.load_obj(text)
        assert v.shape == (5, 3)
        # quad fans into 2 triangles + 1 explicit
        assert f.shape == (3, 3)
        np.testing.assert_array_equal(f[0], [0, 1, 2])
        np.testing.assert_array_equal(f[1], [0, 2, 3])
        np.testing.assert_array_equal(f[2], [1, 4, 2])

    def test_negative_indices(self):
        v, f = mesh.load_obj("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
        np.testing.assert_array_equal(f, [[0, 1, 2]])

    def test_out_of_range_raises(self):
        with pytest.raises(ValueError):
            mesh.load_obj("v 0 0 0\nf 1 2 3\n")

    def test_roundtrip_through_transform(self):
        v, f = mesh.icosphere(0)
        v2 = mesh.transform_mesh(v, scale=2.0, rotate_y=0.5,
                                 translate=(1, 2, 3))
        lo, hi = mesh.mesh_bounds(v2)
        np.testing.assert_allclose(0.5 * (lo + hi), (1, 2, 3), atol=1e-9)
        np.testing.assert_allclose(np.linalg.norm(v2 - (1, 2, 3), axis=-1),
                                   2.0, rtol=1e-9)


class TestMeshScene:
    def test_sphere_mesh_hit_distance_matches_analytic(self):
        # rays at a faceted sphere hit within the facet sagitta of the
        # analytic sphere hit
        v, f = mesh.icosphere(3, center=(0.0, 0.0, 0.0), radius=1.0)
        sc = builders.mesh_scene(v, f, ground=False, width=8, height=8)
        o = jnp.asarray([[0.0, 0.0, 4.0]] * 3)
        d = jnp.asarray([[0.0, 0.0, -1.0],
                         [0.05, 0.02, -1.0],
                         [-0.03, 0.04, -1.0]])
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        hit = kscene.intersect(sc, o, d)
        assert bool(hit.valid.all())
        # analytic sphere hit per ray: t = -o.d - sqrt((o.d)^2 - |o|^2 + 1)
        on, dn = np.asarray(o, np.float64), np.asarray(d, np.float64)
        b = np.einsum("ni,ni->n", on, dn)
        t_true = -b - np.sqrt(b * b - np.einsum("ni,ni->n", on, on) + 1.0)
        # facet error bound: icosphere(3) edge ~ 0.11 rad -> sagitta ~ 2e-3
        np.testing.assert_allclose(np.asarray(hit.t), t_true, atol=5e-3)
        # normals roughly radial
        n = np.asarray(jnp.stack([hit.normal[..., i] for i in range(3)], -1))
        hp = np.asarray(o + d * hit.t[:, None])
        cosang = np.einsum("ni,ni->n", n, hp / np.linalg.norm(
            hp, axis=-1, keepdims=True))
        assert (cosang > 0.99).all()

    def test_mesh_scene_renders_finite_and_visible(self):
        v, f = mesh.torus(nu=10, nv=6)
        sc = builders.mesh_scene(v, f, width=24, height=16)
        from kytpu.integrator.render import render
        img = np.asarray(render(sc, spp=2, seed=3, engine="fast"))
        assert np.isfinite(img).all()
        assert img.max() > 0.01

    def test_mesh_scene_is_bigscene_eligible(self):
        from kytpu.kernels import bigscene as bs
        v, f = mesh.icosphere(1)
        sc = builders.mesh_scene(v, f, width=16, height=16)
        static, tables = bs.extract_tables(sc)
        assert tables["tri"][0].shape[0] >= 80

    def test_degenerate_faces_dropped(self):
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
        f = np.array([[0, 1, 2], [0, 1, 1]])   # second face degenerate
        sc = builders.mesh_scene(v, f, ground=False, width=8, height=8)
        # 1 triangle + light sphere
        assert int(sc.geometry.n_surfaces) == 2
