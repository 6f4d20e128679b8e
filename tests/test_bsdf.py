"""BSDF tests: white-furnace energy checks, sample/pdf/eval consistency,
delta-lobe conventions, plastic lobe resolution (SURVEY.md §7 step 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kytpu import bsdf as kbsdf
from kytpu.core import math as km
from kytpu.core import rng as krng

N = 100_000


def _params(kind, color=(1.0, 1.0, 1.0), color2=(1.0, 1.0, 1.0),
            eta=1.5, exponent=50.0, n=N):
    return kbsdf.BsdfParams(
        kind=jnp.full((n,), kind, jnp.int32),
        color=jnp.tile(jnp.asarray(color, jnp.float32), (n, 1)),
        color2=jnp.tile(jnp.asarray(color2, jnp.float32), (n, 1)),
        eta=jnp.full((n,), eta, jnp.float32),
        exponent=jnp.full((n,), exponent, jnp.float32))


def _wo(n=N, z=0.6):
    w = jnp.tile(km.normalize(jnp.asarray([[0.4, 0.2, z]])), (n, 1))
    return w


def _u2(seed, n=N):
    return jax.random.uniform(jax.random.key(seed), (n, 2))


def test_lambert_furnace():
    """E[f cos / pdf] over BSDF samples = albedo (energy conservation)."""
    albedo = (0.7, 0.5, 0.3)
    p = _params(kbsdf.LAMBERT, albedo)
    wo = _wo()
    s = kbsdf.sample_local(p, wo, _u2(0))
    est = np.asarray(s.f, np.float64) * np.abs(np.asarray(s.wi[:, 2:3])) \
        / np.asarray(s.pdf)[:, None]
    # f*cos/pdf is exactly albedo per-sample for Lambert; accumulate the
    # mean in float64 (naive f32 summation over 1e5 lanes loses ~5e-4)
    assert np.allclose(est.mean(axis=0), albedo, rtol=1e-5)


def test_lambert_eval_pdf():
    p = _params(kbsdf.LAMBERT, (0.8, 0.8, 0.8))
    wo = _wo()
    wi = km.cosine_hemisphere_sample(_u2(1))
    f = np.asarray(kbsdf.eval_local(p, wo, wi))
    assert np.allclose(f, 0.8 / np.pi, atol=1e-6)
    pdf = np.asarray(kbsdf.pdf_local(p, wo, wi))
    assert np.allclose(pdf, np.asarray(wi[:, 2]) / np.pi, atol=1e-6)
    # opposite hemisphere: zero
    wi_dn = wi * jnp.asarray([1.0, 1.0, -1.0])
    assert np.all(np.asarray(kbsdf.eval_local(p, wo, wi_dn)) == 0)
    assert np.all(np.asarray(kbsdf.pdf_local(p, wo, wi_dn)) == 0)


def test_lambert_flips_to_wo_hemisphere():
    p = _params(kbsdf.LAMBERT, n=1000)
    wo = -_wo(1000)  # wo below the surface
    s = kbsdf.sample_local(p, wo, _u2(2, 1000))
    assert np.all(np.asarray(s.wi[:, 2]) < 0)
    assert np.all(np.asarray(s.pdf) > 0)


def test_mirror_delta():
    p = _params(kbsdf.MIRROR, (0.9, 0.9, 0.9), n=1000)
    wo = _wo(1000)
    s = kbsdf.sample_local(p, wo, _u2(3, 1000))
    wi = np.asarray(s.wi)
    wo_np = np.asarray(wo)
    assert np.allclose(wi, wo_np * [-1, -1, 1], atol=1e-6)
    assert np.allclose(np.asarray(s.pdf), 1.0)
    assert np.allclose(np.asarray(s.f), 0.9 / np.abs(wo_np[:, 2:3]), atol=1e-5)
    assert np.all(np.asarray(s.delta))
    # delta lobes evaluate/pdf to zero
    assert np.all(np.asarray(kbsdf.eval_local(p, wo, s.wi)) == 0)
    assert np.all(np.asarray(kbsdf.pdf_local(p, wo, s.wi)) == 0)


def test_glass_energy_split():
    """Weighted combination reconstructs unit throughput: since
    f = c * P / |cos| and pdf = P, f*cos/pdf = c for both branches."""
    p = _params(kbsdf.GLASS, (1, 1, 1), (1, 1, 1), eta=1.6)
    wo = _wo()
    s = kbsdf.sample_local(p, wo, _u2(4))
    thr = np.asarray(s.f) * np.abs(np.asarray(s.wi[:, 2:3])) \
        / np.maximum(np.asarray(s.pdf)[:, None], 1e-12)
    assert np.allclose(thr, 1.0, atol=1e-4)


def test_glass_refraction_direction():
    p = _params(kbsdf.GLASS, eta=1.5, n=4)
    wo = jnp.tile(km.normalize(jnp.asarray([[0.5, 0.0, 0.8]])), (4, 1))
    # u[0]=0.99 forces the refract branch (Fr(37deg, 1.5) << 0.99)
    u = jnp.tile(jnp.asarray([[0.99, 0.5]]), (4, 1))
    s = kbsdf.sample_local(p, wo, u)
    wi = np.asarray(s.wi[0])
    assert wi[2] < 0  # crossed the interface
    sin_i = float(jnp.linalg.norm(wo[0, :2]))
    sin_t = np.linalg.norm(wi[:2]) / np.linalg.norm(wi)
    assert np.isclose(sin_t, sin_i / 1.5, atol=1e-5)


def test_glass_tir_from_inside():
    """Steep exit from dense medium: refract branch must fail (f=0)."""
    p = _params(kbsdf.GLASS, eta=1.5, n=1)
    wo = km.normalize(jnp.asarray([[0.95, 0.0, -0.3]]))  # from inside
    u = jnp.asarray([[0.9999, 0.5]])  # try to refract
    s = kbsdf.sample_local(p, wo, u)
    # fresnel returns 1 under TIR, so reflect always wins; force the
    # comparison by checking either reflected or zero-f behavior
    f = np.asarray(s.f)
    wi = np.asarray(s.wi)
    assert (f == 0).all() or np.allclose(wi[0], np.asarray(wo[0]) * [-1, -1, 1],
                                         atol=1e-5)


def test_phong_furnace_bounded():
    """Modified Phong with reflectance 1 conserves energy (<= 1)."""
    p = _params(kbsdf.PHONG, (1, 1, 1), exponent=20.0)
    wo = _wo(z=0.9)
    s = kbsdf.sample_local(p, wo, _u2(5))
    ok = np.asarray(s.pdf) > 1e-8
    thr = (np.asarray(s.f)[ok] * np.abs(np.asarray(s.wi[ok, 2:3]))
           / np.asarray(s.pdf)[ok, None])
    mean = thr.mean(axis=0) * ok.mean()
    assert (mean <= 1.0 + 5e-3).all()
    assert (mean > 0.5).all()  # not wildly lossy at normal-ish incidence


def test_phong_eval_pdf_match_sample():
    p = _params(kbsdf.PHONG, (1, 0.5, 0.25), exponent=12.0)
    wo = _wo()
    s = kbsdf.sample_local(p, wo, _u2(6))
    f2 = kbsdf.eval_local(p, wo, s.wi)
    pdf2 = kbsdf.pdf_local(p, wo, s.wi)
    assert np.allclose(np.asarray(f2), np.asarray(s.f), atol=1e-5)
    assert np.allclose(np.asarray(pdf2), np.asarray(s.pdf), atol=1e-5)


def test_phong_pdf_integrates_to_one():
    """Integrate the phong pdf over the sphere with uniform MC."""
    p = _params(kbsdf.PHONG, exponent=8.0)
    wo = _wo()
    wi = km.uniform_sphere_sample(_u2(7))
    pdf = np.asarray(kbsdf.pdf_local(p, wo, wi))
    est = pdf.mean() * 4 * np.pi
    assert np.isclose(est, 1.0, rtol=2e-2)


def test_resolve_plastic_lobe_statistics():
    n = 50_000
    diffuse = jnp.tile(jnp.asarray([[0.1, 0.1, 0.1]]), (n, 1))
    specular = jnp.tile(jnp.asarray([[0.7, 0.7, 0.7]]), (n, 1))
    dl, sl = km.luminance(diffuse), km.luminance(specular)
    dp, sp = dl / (dl + sl), sl / (dl + sl)
    u = jax.random.uniform(jax.random.key(8), (n,))
    params = kbsdf.resolve_bsdf(
        jnp.full((n,), kbsdf.MAT_PLASTIC, jnp.int32), diffuse, specular,
        jnp.full((n,), 90.0), jnp.ones((n,)), dp, sp, u)
    frac_spec = float(np.mean(np.asarray(params.kind) == kbsdf.PHONG))
    assert np.isclose(frac_spec, 7 / 8, atol=0.01)
    # lobe colors are scaled by 1/prob so the expectation is unchanged
    spec_lanes = np.asarray(params.kind) == kbsdf.PHONG
    assert np.allclose(np.asarray(params.color)[spec_lanes][0],
                       0.7 / float(sp[0]), atol=1e-5)


def test_resolve_simple_materials():
    n = 3
    kinds = jnp.asarray([kbsdf.MAT_MATTE, kbsdf.MAT_MIRROR, kbsdf.MAT_GLASS],
                        jnp.int32)
    diffuse = jnp.tile(jnp.asarray([[0.5, 0.25, 0.125]]), (n, 1))
    specular = jnp.tile(jnp.asarray([[0.9, 0.8, 0.7]]), (n, 1))
    p = kbsdf.resolve_bsdf(kinds, diffuse, specular, jnp.zeros(n),
                           jnp.full((n,), 1.6), jnp.ones(n), jnp.zeros(n),
                           jnp.full((n,), 0.5))
    assert list(np.asarray(p.kind)) == [kbsdf.LAMBERT, kbsdf.MIRROR, kbsdf.GLASS]
    assert np.allclose(np.asarray(p.color[0]), [0.5, 0.25, 0.125])
    assert np.allclose(np.asarray(p.color[1]), [0.9, 0.8, 0.7])
    assert np.allclose(np.asarray(p.color[2]), [0.9, 0.8, 0.7])  # reflection
    assert np.allclose(np.asarray(p.color2[2]), [0.5, 0.25, 0.125])  # transmission


def test_world_local_consistency():
    n = 1000
    key = jax.random.key(9)
    normal = km.normalize(jax.random.normal(key, (n, 3)))
    wo = km.normalize(jax.random.normal(jax.random.key(10), (n, 3)))
    p = _params(kbsdf.LAMBERT, (0.6, 0.6, 0.6), n=n)
    s = kbsdf.sample_world(p, normal, wo, _u2(11, n))
    # sampled wi lies in the same hemisphere as... wo's side of the normal
    side_wo = np.sign(np.asarray(km.dot(wo, normal)))
    side_wi = np.sign(np.asarray(km.dot(s.wi, normal)))
    assert (side_wo == side_wi).all()
    f, pdf = kbsdf.eval_and_pdf_world(p, normal, wo, s.wi)
    assert np.allclose(np.asarray(f), np.asarray(s.f), atol=1e-5)
    assert np.allclose(np.asarray(pdf), np.asarray(s.pdf), atol=1e-5)
