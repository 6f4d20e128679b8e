"""Independent numpy path-tracer oracle for cross-checking the JAX renderer.

Written separately from kytpu's jnp code (different structure: per-bounce
active-index compaction instead of masked lanes, per-surface python loops
instead of SoA sweeps, numpy Generator RNG instead of threefry folding) so
vectorization bugs in either implementation surface as disagreement. The
physics follows the same reference behavior (infancy/ky, SURVEY.md) —
agreement is checked statistically at matched spp.

Only the configurations used by the golden tests are supported:
matte/mirror/glass/plastic materials, rect/sphere/tri/disk shapes,
rect/sphere area lights + point/direction/environment, the "both_mis",
"light" and "bsdf" NEE strategies, and the "iteration" integrator.
"""

from __future__ import annotations

import numpy as np

SHAPE_EPS = 1e-3
RAY_OFF = 1e-2
SHADOW_EPS = 2e-3


# --------------------------- scene extraction ------------------------------

class OracleScene:
    """Numpy copy of a kytpu Scene pytree."""

    def __init__(self, scene):
        g = scene.geometry
        self.pl_kind = np.asarray(g.pl_kind)
        self.pl_p = [np.asarray(p) for p in (g.pl_p0, g.pl_p1, g.pl_p2, g.pl_p3)]
        self.pl_n = np.asarray(g.pl_normal)
        self.pl_r = np.asarray(g.pl_radius)
        self.pl_area = np.asarray(g.pl_area)
        self.sp_c = np.asarray(g.sp_center)
        self.sp_r = np.asarray(g.sp_radius)
        self.P = self.pl_n.shape[0]
        self.S = self.sp_c.shape[0]

        self.mat_kind = np.asarray(scene.mat_kind)
        self.mat_diffuse = np.asarray(scene.mat_diffuse)
        self.mat_specular = np.asarray(scene.mat_specular)
        self.mat_exponent = np.asarray(scene.mat_exponent)
        self.mat_eta = np.asarray(scene.mat_eta)
        self.mat_d_prob = np.asarray(scene.mat_d_prob)
        self.mat_s_prob = np.asarray(scene.mat_s_prob)
        self.emission = np.asarray(scene.emission)
        self.light_index = np.asarray(scene.light_index)

        li = scene.lights
        self.light_kinds = li.kinds
        self.l_emit = np.asarray(li.emit)
        self.l_pos = np.asarray(li.position)
        self.l_dir = np.asarray(li.direction)
        self.l_p0 = np.asarray(li.p0)
        self.l_p1 = np.asarray(li.p1)
        self.l_p2 = np.asarray(li.p2)
        self.l_p3 = np.asarray(li.p3)
        self.l_n = np.asarray(li.normal)
        self.l_area = np.asarray(li.area)
        self.l_c = np.asarray(li.center)
        self.l_r = np.asarray(li.radius)

        self.world_radius = float(scene.world_radius)
        self.has_env = scene.has_env
        self.env = np.asarray(scene.env_radiance_) if scene.has_env else np.zeros(3)

        cam = scene.camera
        self.cam_pos = np.asarray(cam.position)
        self.cam_front = np.asarray(cam.front)
        self.cam_right = np.asarray(cam.right)
        self.cam_up = np.asarray(cam.up)
        self.w, self.h = cam.width, cam.height


def _norm(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def _dot(a, b):
    return np.sum(a * b, axis=-1)


# ----------------------------- intersection --------------------------------

def intersect(sc: OracleScene, o, d, tmax=None):
    """Closest hit by looping surfaces (reference-style linear scan).

    Returns dict of arrays over the ray batch.
    """
    n = o.shape[0]
    best_t = np.full(n, np.inf)
    best_sid = np.full(n, -1, np.int64)
    if tmax is not None:
        limit = tmax.copy()
    else:
        limit = np.full(n, np.inf)

    for j in range(sc.P):
        kind = sc.pl_kind[j]
        p0, p1, p2, p3 = (sc.pl_p[k][j] for k in range(4))
        nrm = sc.pl_n[j]
        denom = d @ nrm
        with np.errstate(divide="ignore", invalid="ignore"):
            t = _dot(nrm[None], p0[None] - o) / denom
        if kind == 2:  # disk
            hp = o + t[:, None] * d
            inside = np.linalg.norm(hp - p0[None], axis=-1) <= sc.pl_r[j]
            inside &= np.abs(denom) > 1e-12
        else:
            oa, ob, oc, od = (p - o for p in (p0, p1, p2, p3))
            v0 = _dot(np.cross(oc, ob), d)
            v1 = _dot(np.cross(ob, oa), d)
            if kind == 0:  # tri
                v2 = _dot(np.cross(oa, oc), d)
                inside = ((v0 < 0) & (v1 < 0) & (v2 < 0)) | \
                         ((v0 >= 0) & (v1 >= 0) & (v2 >= 0))
            else:
                v2 = _dot(np.cross(oa, od), d)
                v3 = _dot(np.cross(od, oc), d)
                inside = ((v0 < 0) & (v1 < 0) & (v2 < 0) & (v3 < 0)) | \
                         ((v0 >= 0) & (v1 >= 0) & (v2 >= 0) & (v3 >= 0))
        ok = inside & (t > SHAPE_EPS) & (t < np.minimum(limit, best_t))
        ok &= np.isfinite(t)
        best_t[ok] = t[ok]
        best_sid[ok] = j

    for j in range(sc.S):
        c, r = sc.sp_c[j], sc.sp_r[j]
        oc = c[None] - o
        nb = _dot(oc, d)
        disc = nb * nb - _dot(oc, oc) + r * r
        sq = np.sqrt(np.maximum(disc, 0.0))
        t1, t2 = nb - sq, nb + sq
        cap = np.minimum(limit, best_t)
        t1ok = (t1 > SHAPE_EPS) & (t1 < cap)
        t2ok = (t2 > SHAPE_EPS) & (t2 < cap)
        t = np.where(t1ok, t1, t2)
        ok = (disc >= 0) & (t1ok | t2ok)
        best_t[ok] = t[ok]
        best_sid[ok] = sc.P + j

    valid = np.isfinite(best_t)
    pos = o + np.where(valid, best_t, 0.0)[:, None] * d
    nrm = np.zeros_like(o)
    for j in range(sc.P):
        m = valid & (best_sid == j)
        if not m.any():
            continue
        nn = np.tile(sc.pl_n[j], (int(m.sum()), 1))
        if sc.pl_kind[j] == 1:  # rect flips toward ray
            flip = _dot(nn, d[m]) > 0
            nn[flip] *= -1
        nrm[m] = nn
    for j in range(sc.S):
        m = valid & (best_sid == sc.P + j)
        if not m.any():
            continue
        nrm[m] = _norm(pos[m] - sc.sp_c[j][None])

    emission = np.zeros_like(o)
    hm = valid
    if hm.any():
        rad = sc.emission[best_sid[hm]]
        facing = _dot(nrm[hm], -d[hm]) > 0
        emission[hm] = np.where(facing[:, None], rad, 0.0)
    light_idx = np.where(valid, sc.light_index[np.maximum(best_sid, 0)], -1)
    return dict(t=best_t, valid=valid, pos=pos, n=nrm, wo=-d,
                sid=best_sid, emission=emission, light=light_idx)


def occluded(sc, pos, nrm, d, dist):
    off = np.where(_dot(nrm, d)[:, None] < 0, -1.0, 1.0) * RAY_OFF * nrm
    h = intersect(sc, pos + off, d, tmax=dist - SHADOW_EPS)
    return h["valid"]


# ------------------------------- BSDFs -------------------------------------

def make_onb(n):
    helper = np.where(np.abs(n[:, :1]) > 0.99,
                      np.array([0.0, 1.0, 0.0]), np.array([1.0, 0.0, 0.0]))
    t = _norm(np.cross(n, helper))
    s = _norm(np.cross(t, n))
    return s, t, n


def to_local(s, t, n, w):
    return np.stack([_dot(s, w), _dot(t, w), _dot(n, w)], -1)


def to_world(s, t, n, w):
    return w[:, :1] * s + w[:, 1:2] * t + w[:, 2:3] * n


def fresnel(ci, ei, et):
    ci = np.clip(ci, -1, 1)
    swap = ci <= 0
    ei2 = np.where(swap, et, ei)
    et2 = np.where(swap, ei, et)
    ci = np.abs(ci)
    si = np.sqrt(np.maximum(0, 1 - ci * ci))
    st = ei2 / et2 * si
    ct = np.sqrt(np.maximum(0, 1 - np.minimum(st, 1) ** 2))
    rp = (et2 * ci - ei2 * ct) / (et2 * ci + ei2 * ct)
    rs = (ei2 * ci - et2 * ct) / (ei2 * ci + et2 * ct)
    return np.where(st >= 1, 1.0, 0.5 * (rp * rp + rs * rs))


class Bsdf:
    """Per-batch resolved BSDF (kind + colors), numpy."""

    def __init__(self, sc, sid, rng):
        k = sc.mat_kind[sid]
        self.kind = np.where(k == 0, 0, np.where(k == 1, 1, np.where(k == 2, 2, -1)))
        self.color = np.where((k == 0)[:, None], sc.mat_diffuse[sid],
                              sc.mat_specular[sid])
        self.color2 = sc.mat_diffuse[sid]
        self.eta = sc.mat_eta[sid]
        self.exp = sc.mat_exponent[sid]
        plastic = k == 3
        if plastic.any():
            u = rng.random(sid.shape[0])
            spec = plastic & (u < sc.mat_s_prob[sid])
            diff = plastic & ~spec
            self.kind = np.where(spec, 3, np.where(diff, 0, self.kind))
            sp = np.maximum(sc.mat_s_prob[sid], 1e-12)
            dp = np.maximum(sc.mat_d_prob[sid], 1e-12)
            self.color = np.where(spec[:, None], sc.mat_specular[sid] / sp[:, None],
                                  self.color)
            self.color = np.where(diff[:, None], sc.mat_diffuse[sid] / dp[:, None],
                                  self.color)

    def is_delta(self):
        return (self.kind == 1) | (self.kind == 2)

    def eval(self, wo, wi):
        same = wo[:, 2] * wi[:, 2] > 0
        f = np.zeros_like(self.color)
        lam = self.kind == 0
        f[lam & same] = self.color[lam & same] / np.pi
        ph = self.kind == 3
        if ph.any():
            wr = wo * np.array([-1.0, -1.0, 1.0])
            ca = np.maximum(_dot(wr, wi), 0.0)
            val = (self.exp + 2) / (2 * np.pi) * ca ** self.exp
            f[ph & same] = self.color[ph & same] * val[ph & same, None]
        return f

    def pdf(self, wo, wi):
        same = wo[:, 2] * wi[:, 2] > 0
        p = np.zeros(wo.shape[0])
        lam = self.kind == 0
        p[lam & same] = np.abs(wi[lam & same, 2]) / np.pi
        ph = self.kind == 3
        if ph.any():
            wr = wo * np.array([-1.0, -1.0, 1.0])
            ca = np.maximum(_dot(wr, wi), 0.0)
            p[ph] = ((self.exp + 1) * ca ** self.exp / (2 * np.pi))[ph]
        return p

    def sample(self, wo, rng):
        n = wo.shape[0]
        wi = np.zeros_like(wo)
        f = np.zeros_like(self.color)
        pdf = np.zeros(n)
        u = rng.random((n, 2))

        lam = self.kind == 0
        if lam.any():
            r = np.sqrt(u[lam, 0])
            th = 2 * np.pi * u[lam, 1]
            z = np.sqrt(np.maximum(0, 1 - r * r))
            w = np.stack([r * np.cos(th), r * np.sin(th), z], -1)
            w[:, 2] *= np.where(wo[lam, 2] < 0, -1.0, 1.0)
            wi[lam] = w
            f[lam] = self.color[lam] / np.pi
            pdf[lam] = np.abs(w[:, 2]) / np.pi

        mir = self.kind == 1
        if mir.any():
            w = wo[mir] * np.array([-1.0, -1.0, 1.0])
            wi[mir] = w
            f[mir] = self.color[mir] / np.abs(w[:, 2:3])
            pdf[mir] = 1.0

        gl = self.kind == 2
        if gl.any():
            woz = wo[gl, 2]
            fr = fresnel(woz, 1.0, self.eta[gl])
            refl = u[gl, 0] < fr
            w = np.zeros((int(gl.sum()), 3))
            fg = np.zeros((int(gl.sum()), 3))
            pg = np.zeros(int(gl.sum()))
            w[refl] = wo[gl][refl] * np.array([-1.0, -1.0, 1.0])
            fg[refl] = self.color[gl][refl] * fr[refl, None] \
                / np.abs(w[refl, 2:3])
            pg[refl] = fr[refl]
            tr = ~refl
            if tr.any():
                wot = wo[gl][tr]
                into = wot[:, 2] > 0
                nz = np.where(into, 1.0, -1.0)
                eta_r = np.where(into, 1.0 / self.eta[gl][tr], self.eta[gl][tr])
                ci = wot[:, 2] * nz
                s2t = eta_r**2 * np.maximum(0, 1 - ci * ci)
                ok = s2t < 1
                ct = np.sqrt(np.maximum(0, 1 - s2t))
                nvec = np.stack([np.zeros_like(nz), np.zeros_like(nz), nz], -1)
                wt = eta_r[:, None] * -wot + (eta_r * ci - ct)[:, None] * nvec
                w[tr] = np.where(ok[:, None], wt, 0.0)
                frt = fr[tr]
                ft = self.color2[gl][tr] * (1 - frt)[:, None] \
                    / np.maximum(np.abs(w[tr, 2:3]), 1e-12)
                fg[tr] = np.where(ok[:, None], ft, 0.0)
                pg[tr] = np.where(ok, 1 - frt, 0.0)
            wi[gl] = w
            f[gl] = fg
            pdf[gl] = pg

        ph = self.kind == 3
        if ph.any():
            e = self.exp[ph]
            phis = 2 * np.pi * u[ph, 0]
            ct = u[ph, 1] ** (1 / (e + 1))
            st = np.sqrt(np.maximum(0, 1 - ct * ct))
            lobe = np.stack([np.cos(phis) * st, np.sin(phis) * st, ct], -1)
            wr = wo[ph] * np.array([-1.0, -1.0, 1.0])
            s, t, nn = make_onb(wr)
            w = to_world(s, t, nn, lobe)
            w[:, 2] *= np.where(wo[ph, 2] < 0, -1.0, 1.0)
            wi[ph] = w
            sub = np.zeros(n, bool)
            sub[ph] = True
            f[ph] = self.eval(wo, wi)[ph]
            pdf[ph] = self.pdf(wo, wi)[ph]
        return f, wi, pdf, self.is_delta()


# ------------------------------ lights -------------------------------------

def light_sample(sc, i, pos, nrm, rng):
    kind = sc.light_kinds[i]
    n = pos.shape[0]
    u = rng.random((n, 2))
    if kind == 0:  # point
        lp = sc.l_pos[i][None]
        wi = _norm(lp - pos)
        li = sc.l_emit[i][None] / np.maximum(_dot(lp - pos, lp - pos), 1e-20)[:, None]
        return np.tile(lp, (n, 1)), wi, np.ones(n), li
    if kind == 1:  # direction
        wi = np.tile(-sc.l_dir[i], (n, 1))
        return pos + wi * 2 * sc.world_radius, wi, np.ones(n), \
            np.tile(sc.l_emit[i], (n, 1))
    if kind == 2:  # rect
        lp = sc.l_p1[i][None] + u[:, :1] * (sc.l_p0[i] - sc.l_p1[i])[None] \
            + u[:, 1:2] * (sc.l_p2[i] - sc.l_p1[i])[None]
        vec = lp - pos
        d2 = _dot(vec, vec)
        wi = _norm(vec)
        cosl = np.abs(_dot(np.tile(sc.l_n[i], (n, 1)), -wi))
        with np.errstate(divide="ignore"):
            pdf = d2 / (cosl * sc.l_area[i])
        pdf = np.where(np.isfinite(pdf), pdf, 0.0)
        li = np.where((_dot(sc.l_n[i][None], -wi) > 0)[:, None],
                      sc.l_emit[i][None], 0.0)
        return lp, wi, pdf, li
    if kind == 3:  # sphere (outside-cone only; oracle scenes stay outside)
        c, r = sc.l_c[i], sc.l_r[i]
        dist = np.linalg.norm(pos - c[None], axis=-1)
        sin_max = r / dist
        s2max = sin_max**2
        cmax = np.sqrt(np.maximum(0, 1 - s2max))
        ct = (cmax - 1) * u[:, 0] + 1
        s2 = 1 - ct * ct
        tiny = s2max < 0.00068523
        s2 = np.where(tiny, s2max * u[:, 0], s2)
        ct = np.where(tiny, np.sqrt(1 - s2), ct)
        ca = s2 / sin_max + ct * np.sqrt(np.maximum(0, 1 - s2 / s2max))
        sa = np.sqrt(np.maximum(0, 1 - ca * ca))
        phi = 2 * np.pi * u[:, 1]
        axis = (c[None] - pos) / dist[:, None]
        s, t, nn = make_onb(axis)
        nl = (sa * np.cos(phi))[:, None] * -s + (sa * np.sin(phi))[:, None] * -t \
            + ca[:, None] * -nn
        lp = c[None] + r * nl
        pdf = 1.0 / (2 * np.pi * (1 - cmax))
        wi = _norm(lp - pos)
        li = np.where((_dot(nl, -wi) > 0)[:, None], sc.l_emit[i][None], 0.0)
        return lp, wi, pdf, li
    if kind == 4:  # env
        z = 1 - 2 * u[:, 0]
        rr = np.sqrt(np.maximum(0, 1 - z * z))
        phi = 2 * np.pi * u[:, 1]
        wi = np.stack([rr * np.cos(phi), rr * np.sin(phi), z], -1)
        sin_t = np.sqrt(np.maximum(0, 1 - wi[:, 2] ** 2))
        pdf = np.where(sin_t == 0, 0.0, 1 / (2 * np.pi**2 * np.maximum(sin_t, 1e-20)))
        return pos + wi * 2 * sc.world_radius, wi, pdf, \
            np.tile(sc.l_emit[i], (n, 1))
    raise ValueError(kind)


def light_pdf(sc, i, pos, nrm, wi):
    kind = sc.light_kinds[i]
    n = pos.shape[0]
    if kind in (0, 1):
        return np.zeros(n)
    if kind == 2:
        off = np.where(_dot(nrm, wi)[:, None] < 0, -1.0, 1.0) * RAY_OFF * nrm
        o = pos + off
        p0, p1, p2, p3 = sc.l_p0[i], sc.l_p1[i], sc.l_p2[i], sc.l_p3[i]
        nl = sc.l_n[i]
        oa, ob, oc, od = (p[None] - o for p in (p0, p1, p2, p3))
        v0 = _dot(np.cross(oc, ob), wi)
        v1 = _dot(np.cross(ob, oa), wi)
        v2 = _dot(np.cross(oa, od), wi)
        v3 = _dot(np.cross(od, oc), wi)
        inside = ((v0 < 0) & (v1 < 0) & (v2 < 0) & (v3 < 0)) | \
                 ((v0 >= 0) & (v1 >= 0) & (v2 >= 0) & (v3 >= 0))
        with np.errstate(divide="ignore", invalid="ignore"):
            t = _dot(nl[None], oa) / (wi @ nl)
        ok = inside & (t > SHAPE_EPS) & np.isfinite(t)
        hp = o + t[:, None] * wi
        d2 = _dot(pos - hp, pos - hp)
        with np.errstate(divide="ignore", invalid="ignore"):
            pdf = d2 / (np.abs(wi @ nl) * sc.l_area[i])
        return np.where(ok & np.isfinite(pdf), pdf, 0.0)
    if kind == 3:
        c, r = sc.l_c[i], sc.l_r[i]
        d2c = _dot(pos - c[None], pos - c[None])
        s2max = np.minimum(r * r / d2c, 1.0)
        cmax = np.sqrt(np.maximum(0, 1 - s2max))
        with np.errstate(divide="ignore"):
            pdf = 1 / (2 * np.pi * (1 - cmax))
        return np.where(np.isfinite(pdf), pdf, 0.0)
    if kind == 4:
        sin_t = np.sqrt(np.maximum(0, 1 - wi[:, 2] ** 2))
        return np.where(sin_t == 0, 0.0,
                        1 / (2 * np.pi**2 * np.maximum(sin_t, 1e-20)))
    raise ValueError(kind)


# ----------------------------- integrator ----------------------------------

def _nee(sc, h, bsdf, act, rng, strategy):
    n = h["pos"].shape[0]
    ld = np.zeros((n, 3))
    pos, nrm, wo = h["pos"], h["n"], h["wo"]
    s, t, nn = make_onb(nrm)
    wol = to_local(s, t, nn, wo)
    for i, kind in enumerate(sc.light_kinds):
        delta_light = kind in (0, 1)

        if strategy in ("light", "light_mis", "both_mis"):
            lp, wi, pdf, li = light_sample(sc, i, pos, nrm, rng)
            wil = to_local(s, t, nn, wi)
            ok = act & (pdf > 0) & (li.sum(-1) > 0)
            dist = np.linalg.norm(lp - pos, axis=-1)
            if ok.any():
                sh = occluded(sc, pos, nrm, wi, dist)
                ok &= ~sh
            fc = bsdf.eval(wol, wil) * np.abs(_dot(wi, nrm))[:, None]
            ok &= fc.sum(-1) > 0
            if strategy == "light" or delta_light:
                contrib = fc * li / np.maximum(pdf, 1e-20)[:, None]
            else:
                bp = bsdf.pdf(wol, wil)
                contrib = 2 * fc * li / np.maximum(pdf + bp, 1e-20)[:, None]
            w = 0.5 if strategy == "both_mis" else 1.0
            ld += np.where(ok[:, None], w * contrib, 0.0)

        if strategy in ("bsdf", "bsdf_mis", "both_mis") and not delta_light:
            f, wi, pdf, _dl = bsdf.sample(wol, rng)
            wiw = to_world(s, t, nn, wi)
            fc = f * np.abs(_dot(wiw, nrm))[:, None]
            ok = act & (pdf > 0) & (fc.sum(-1) > 0)
            off = np.where(_dot(nrm, wiw)[:, None] < 0, -1.0, 1.0) * RAY_OFF * nrm
            h2 = intersect(sc, pos + off, wiw)
            li = np.where((h2["light"] == i)[:, None], h2["emission"], 0.0)
            if kind == 4:
                li = np.where(h2["valid"][:, None], li, sc.env[None])
            ok &= li.sum(-1) > 0
            if strategy == "bsdf":
                contrib = fc * li / np.maximum(pdf, 1e-20)[:, None]
            else:
                lpdf = light_pdf(sc, i, pos, nrm, wiw)
                contrib = np.where((lpdf > 0)[:, None],
                                   2 * fc * li / np.maximum(pdf + lpdf, 1e-20)[:, None],
                                   0.0)
            w = 0.5 if strategy == "both_mis" else 1.0
            ld += np.where(ok[:, None], w * contrib, 0.0)
    return ld


def li_iteration(scene, o, d, rng, max_depth=5, strategy="both_mis"):
    """Numpy PT-iteration over a ray batch; returns (N,3)."""
    sc = scene if isinstance(scene, OracleScene) else OracleScene(scene)
    n = o.shape[0]
    L = np.zeros((n, 3))
    beta = np.ones((n, 3))
    alive = np.ones(n, bool)
    prev_spec = np.zeros(n, bool)
    o = o.copy()
    d = d.copy()
    for bounce in range(max_depth + 1):
        h = intersect(sc, o, d)
        le = np.where(h["valid"][:, None], h["emission"],
                      sc.env[None] if sc.has_env else 0.0)
        gate = alive & ((bounce == 0) | prev_spec)
        L += np.where(gate[:, None], beta * le, 0.0)
        cont = alive & h["valid"] & (bounce < max_depth)
        if not cont.any():
            break
        bsdf = Bsdf(sc, np.maximum(h["sid"], 0), rng)
        L += beta * _nee(sc, h, bsdf, cont & ~bsdf.is_delta(), rng, strategy)

        s, t, nn = make_onb(h["n"])
        wol = to_local(s, t, nn, h["wo"])
        f, wil, pdf, dl = bsdf.sample(wol, rng)
        wi = to_world(s, t, nn, wil)
        ok = cont & (pdf != 0) & (f.sum(-1) > 0)
        thr = f * np.abs(_dot(wi, h["n"]))[:, None] / np.maximum(pdf, 1e-20)[:, None]
        beta_new = beta * thr
        u = rng.random(n)
        if bounce > 3:
            q = np.maximum(0.05, 1 - beta_new.max(-1))
            kill = u < q
            beta_new = beta_new / np.maximum(1 - q, 1e-9)[:, None]
            ok &= ~kill
        alive = ok
        beta = np.where(alive[:, None], beta_new, beta)
        off = np.where(_dot(h["n"], wi)[:, None] < 0, -1.0, 1.0) * RAY_OFF * h["n"]
        o = np.where(alive[:, None], h["pos"] + off, o)
        d = np.where(alive[:, None], wi, d)
        prev_spec = np.where(alive, dl, prev_spec)
    return L


def render_oracle(scene, spp=16, seed=0, max_depth=5, strategy="both_mis"):
    sc = OracleScene(scene)
    rng = np.random.default_rng(seed)
    npix = sc.w * sc.h
    ys, xs = np.divmod(np.arange(npix), sc.w)
    accum = np.zeros((npix, 3))
    for s in range(spp):
        u = rng.random((npix, 2))
        px = (xs + u[:, 0]) / sc.w - 0.5
        py = 0.5 - (ys + u[:, 1]) / sc.h
        d = _norm(sc.cam_front[None] + px[:, None] * sc.cam_right[None]
                  + py[:, None] * sc.cam_up[None])
        o = np.tile(sc.cam_pos, (npix, 1))
        accum += li_iteration(sc, o, d, rng, max_depth, strategy)
    img = np.clip(accum / spp, 0, 1)
    return img.reshape(sc.h, sc.w, 3)
