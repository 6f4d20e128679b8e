"""Table-driven Pallas megakernel for LARGE scenes (hundreds to thousands
of surfaces).

The production megakernel (kernels/wavefront.py) bakes geometry into the
instruction stream — unbeatable per-ray cost, but code size and compile
time grow O(N) and the per-surface-row material machinery (select chains,
adjoint accumulators) assumes a handful of rows. This variant keeps the
same VMEM-resident bounce loop but sweeps geometry with
`jax.lax.fori_loop` over SoA parameter tables:

  - one (rows, cols) table per shape class (tri/rect = shared layout,
    disk, sphere), geometry columns first, material columns after — the
    closest-hit loop reads whole rows and CARRIES the winning hit's
    material through the sweep (per-lane dynamic gathers don't exist on
    the VPU; a select per column per surface is the TPU-native gather,
    and it amortizes to ~15 extra vector ops per surface);
  - occlusion loops read only the geometry columns;
  - loop bodies are unrolled x8: measured 93 Gtests/s vs 106 baked and
    41 un-unrolled on v5e (benchmarks/bigscene_probe.py) — within 12% of
    the baked sweep at O(1) code size and flat ~16 s compiles;
  - tables live in SMEM when they fit (fast scalar reads), else VMEM
    (measured 55 Gtests/s, scales past 4k surfaces; SMEM tables above
    ~16-32 KB fail to compile on v5e).

Transport is the same single-sample-MIS estimator as the baked kernel
(emission MIS-weighted against the light pdf of the ray that found it,
per-light NEE with the merged multi-ray occlusion sweep, iteration-rule
Russian roulette, ky.cpp:4523-4618 semantics), so it converges to the
same image as the jnp engines and the baked kernel. Differentiable
(make_bigscene_diff_tracer: path-replay backward with hit-row-tagged
adjoint planes segment-summed on the host graph) and sampler-complete
(random hw-PRNG or the in-kernel Owen-Sobol lanes of the baked kernel,
cfg.sampler="sobol"). No textures (textured scenes route to the baked
kernel or the jnp engines).

Measured (v5e, random_spheres, depth 3, 1M lanes): see BASELINE.md — the
jnp chunked sweep does 0.41 Mrays/s at 1026 surfaces; this kernel's
per-bounce cost is ~(1+L) * N table tests at 55-93 Gtests/s.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kytpu import bsdf as kbsdf
from kytpu.core import math as km
from kytpu.kernels import wavefront as wf
from kytpu.kernels.v3 import V3, make_frame, to_local, to_world, v3_full, v3_zeros
from kytpu.light import lights as klights
from kytpu.scene import shapes as kshapes

LANE = 128
UNROLL = 8
# total table bytes above which tables move from SMEM to VMEM (SMEM
# tables between 16 and 32 KB already fail to compile on v5e)
SMEM_TABLE_LIMIT = 12 * 1024

# planar table columns: geometry (occlusion loops read only these) ...
PG_NX, PG_NY, PG_NZ, PG_CN = 0, 1, 2, 3          # plane normal, n.anchor
PG_F1X, PG_F1Y, PG_F1Z, PG_K1 = 4, 5, 6, 7       # dual basis 1, f1.anchor
PG_F2X, PG_F2Y, PG_F2Z, PG_K2 = 8, 9, 10, 11     # dual basis 2, f2.anchor
PLANAR_GEO_COLS = 12
# disk table: normal, n.anchor, center, radius^2
DG_NX, DG_NY, DG_NZ, DG_CN, DG_PX, DG_PY, DG_PZ, DG_R2 = range(8)
DISK_GEO_COLS = 8
# sphere table: center, radius
SG_CX, SG_CY, SG_CZ, SG_R = range(4)
SPHERE_GEO_COLS = 4
# material columns appended after the geometry columns of every class
M_DIFX, M_DIFY, M_DIFZ = 0, 1, 2
M_SPCX, M_SPCY, M_SPCZ = 3, 4, 5
M_EMIX, M_EMIY, M_EMIZ = 6, 7, 8
M_KIND, M_EXP, M_ETA, M_SPROB, M_DPROB, M_LIX = 9, 10, 11, 12, 13, 14
M_ROW = 15   # global surface row (for the backward's adjoint scatter)
MAT_COLS = 16


def _pad_rows(a, mult=UNROLL):
    n = a.shape[0]
    npad = ((n + mult - 1) // mult) * mult if n else 0
    if npad == n:
        return a
    return np.concatenate([a, np.zeros((npad - n,) + a.shape[1:],
                                       a.dtype)], axis=0)


def _morton3(points: np.ndarray, lo: np.ndarray, hi: np.ndarray):
    """30-bit Morton keys of points quantized over [lo, hi]."""
    span = np.maximum(hi - lo, 1e-20)
    q = np.clip(((points - lo) / span * 1023.0), 0, 1023).astype(np.uint64)

    def spread(x):
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    return (spread(q[:, 0]) << np.uint64(2)) | (spread(q[:, 1])
                                                << np.uint64(1)) \
        | spread(q[:, 2])


def _block_bounds(centers, radii):
    """Per-UNROLL-block bounding spheres of (already sorted, unpadded)
    per-entry bounds. Returns (n_blocks, 4) [cx cy cz r]; blocks made
    entirely of padding get r = -1 (miss every cull test)."""
    n = len(radii)
    npad = ((n + UNROLL - 1) // UNROLL) * UNROLL if n else 0
    out = np.zeros((npad // UNROLL if npad else 0, 4), np.float32)
    for b in range(out.shape[0]):
        i0, i1 = b * UNROLL, min((b + 1) * UNROLL, n)
        if i0 >= n:
            out[b] = [0, 0, 0, -1.0]
            continue
        cs = np.asarray(centers[i0:i1], np.float64)
        rs = np.asarray(radii[i0:i1], np.float64)
        lo = (cs - rs[:, None]).min(axis=0)
        hi = (cs + rs[:, None]).max(axis=0)
        c = (lo + hi) * 0.5
        r = float(np.max(np.linalg.norm(cs - c, axis=-1) + rs))
        out[b] = [c[0], c[1], c[2], r * 1.0001 + 1e-6]   # conservative pad
    return out


def extract_tables(scene):
    """Host-side extraction: geometry as numpy column blocks per shape
    class + the surface-row index of each table row (for gathering the
    traced material columns), plus the baked light records of
    wavefront.extract_static (lights are few; they stay constants).

    Rows within each class are sorted by the Morton code of their bound
    centers, so each UNROLL-row block is spatially compact; per-block
    bounding spheres feed the in-kernel cone cull (cfg.cull).

    Returns (static, tables) where tables = {class: (geo_np, rows_np,
    bounds_np)}. Raises NotImplementedError for non-parallelogram rects
    and textured scenes (route those to the baked kernel / jnp engines).
    """
    if getattr(scene, "has_textures", False):
        err = wf._kernel_texture_support(scene)
        if err:
            raise NotImplementedError(err)
    static = wf.extract_static(scene)
    if any(r.get("sep") for r in static.get("textures", [])):
        raise NotImplementedError(
            "the table kernel's in-kernel image fetch is the select chain "
            f"(<= {wf._KERNEL_MAX_TEXELS} pow2 texels); larger / non-pow2 "
            "atlases run on the baked kernel or the jnp engines")
    tris, rects, disks = [], [], []
    tri_rows, rect_rows, disk_rows = [], [], []
    tri_b, rect_b, disk_b = [], [], []   # per-entry (center, radius)

    def vert_bound(verts):
        v = np.asarray(verts, np.float64)
        c = (v.min(axis=0) + v.max(axis=0)) * 0.5
        return c, float(np.max(np.linalg.norm(v - c, axis=-1)))

    for row, s in enumerate(static["planar"]):
        if s["kind"] == kshapes.DISK:
            n = np.asarray(s["n"], np.float64)
            p0 = np.asarray(s["p0"], np.float64)
            disks.append(list(n) + [float(np.dot(n, p0))] + list(p0)
                         + [s["radius"] ** 2])
            disk_rows.append(row)
            disk_b.append((p0, float(s["radius"])))
            continue
        if not s.get("fast"):
            raise NotImplementedError(
                "the table-driven kernel supports triangles, parallelogram "
                "rectangles, disks and spheres — this rect is not a "
                "parallelogram (use the baked megakernel / jnp engines)")
        n = np.asarray(s["n"], np.float64)
        anchor = np.asarray(s["anchor"], np.float64)
        f1 = np.asarray(s["f1"], np.float64)
        f2 = np.asarray(s["f2"], np.float64)
        rec = (list(n) + [float(np.dot(n, anchor))]
               + list(f1) + [float(np.dot(f1, anchor))]
               + list(f2) + [float(np.dot(f2, anchor))])
        if s["kind"] == kshapes.TRI:
            tris.append(rec)
            tri_rows.append(row)
            tri_b.append(vert_bound([s["p0"], s["p1"], s["p2"]]))
        else:
            rects.append(rec)
            rect_rows.append(row)
            rect_b.append(vert_bound([s["p0"], s["p1"], s["p2"], s["p3"]]))
    spheres = [list(np.asarray(s["c"], np.float64)) + [s["r"]]
               for s in static["spheres"]]
    sph_rows = [len(static["planar"]) + j for j in range(len(spheres))]
    sph_b = [(np.asarray(s["c"], np.float64), float(s["r"]))
             for s in static["spheres"]]

    # scene-wide AABB of bound centers for Morton quantization
    all_c = [c for bs in (tri_b, rect_b, disk_b, sph_b) for c, _ in bs]
    if all_c:
        allc = np.asarray(all_c, np.float64)
        lo, hi = allc.min(axis=0), allc.max(axis=0)
    else:
        lo = hi = np.zeros(3)

    def blk(lst, rows, bounds, cols):
        geo = np.asarray(lst, np.float32).reshape(len(lst), cols)
        rows = np.asarray(rows, np.int32)
        if len(bounds) > 1:
            centers = np.asarray([c for c, _ in bounds], np.float64)
            order = np.argsort(np.asarray(_morton3(centers, lo, hi)),
                               kind="stable")
            geo = geo[order]
            rows = rows[order]
            bounds = [bounds[i] for i in order]
        bnp = _block_bounds([c for c, _ in bounds],
                            [r for _, r in bounds])
        return _pad_rows(geo), _pad_rows(rows), bnp

    tables = {
        "tri": blk(tris, tri_rows, tri_b, PLANAR_GEO_COLS),
        "rect": blk(rects, rect_rows, rect_b, PLANAR_GEO_COLS),
        "disk": blk(disks, disk_rows, disk_b, DISK_GEO_COLS),
        "sphere": blk(spheres, sph_rows, sph_b, SPHERE_GEO_COLS),
    }
    # global surface row -> (table kind, table row); lets the robust shadow
    # mode skip a light's own geometry inside the table sweeps. Uses the
    # POST-SORT table order (rows_np holds the global row of each entry).
    table_of_row = {}
    n_real = {"tri": len(tris), "rect": len(rects), "disk": len(disks),
              "sphere": len(spheres)}
    for name in ("tri", "rect", "disk", "sphere"):
        for ti, row in enumerate(np.asarray(tables[name][1])[:n_real[name]]):
            table_of_row[int(row)] = (name, ti)
    static["table_of_row"] = table_of_row
    return static, tables


def _mat_cols(scene, rows_np, diffuse=None, specular=None, emission=None,
              exponent=None):
    """Traced (rows, MAT_COLS) material block gathered by surface row.

    diffuse/specular/emission/exponent override the scene tables (the diff
    tracer passes its differentiable arguments here so the gathers are
    traced functions of them)."""
    rows = jnp.asarray(rows_np, jnp.int32)
    npad = rows.shape[0]
    if npad == 0:
        return jnp.zeros((0, MAT_COLS), jnp.float32)
    diffuse = scene.mat_diffuse if diffuse is None else diffuse
    specular = scene.mat_specular if specular is None else specular
    emission = scene.emission if emission is None else emission
    exponent = scene.mat_exponent if exponent is None else exponent
    cols = jnp.concatenate([
        diffuse[rows],
        specular[rows],
        emission[rows],
        scene.mat_kind[rows].astype(jnp.float32)[:, None],
        exponent[rows][:, None],
        scene.mat_eta[rows][:, None],
        scene.mat_s_prob[rows][:, None],
        scene.mat_d_prob[rows][:, None],
        scene.light_index[rows].astype(jnp.float32)[:, None],
        rows.astype(jnp.float32)[:, None],
    ], axis=-1)
    return cols.astype(jnp.float32)


class _Carry:
    """Closest-hit sweep carry: winner's t, normal and material columns."""

    FIELDS = ("t", "nx", "ny", "nz", "difx", "dify", "difz",
              "spcx", "spcy", "spcz", "emix", "emiy", "emiz",
              "kind", "exp", "eta", "sprob", "dprob", "lix", "row")

    @staticmethod
    def init(shp):
        z = jnp.zeros(shp, jnp.float32)
        vals = {f: z for f in _Carry.FIELDS}
        vals["t"] = jnp.full(shp, np.float32(np.inf))
        vals["lix"] = z - 1.0
        vals["row"] = z - 1.0
        return tuple(vals[f] for f in _Carry.FIELDS)

    @staticmethod
    def select(carry, accept, t, n: V3, mat):
        """mat: list of MAT_COLS traced scalars (table row slice)."""
        vals = dict(zip(_Carry.FIELDS, carry))
        new = dict(t=t, nx=n.x, ny=n.y, nz=n.z,
                   difx=mat[M_DIFX], dify=mat[M_DIFY], difz=mat[M_DIFZ],
                   spcx=mat[M_SPCX], spcy=mat[M_SPCY], spcz=mat[M_SPCZ],
                   emix=mat[M_EMIX], emiy=mat[M_EMIY], emiz=mat[M_EMIZ],
                   kind=mat[M_KIND], exp=mat[M_EXP], eta=mat[M_ETA],
                   sprob=mat[M_SPROB], dprob=mat[M_DPROB], lix=mat[M_LIX],
                   row=mat[M_ROW])
        return tuple(jnp.where(accept, new[f], vals[f])
                     for f in _Carry.FIELDS)


def _planar_row_test(tab_ref, s, o: V3, d: V3, tri: bool):
    """(t, inside, n) for planar table row s (padded rows have n = 0 =>
    t = 0/0 = nan, rejected by every comparison)."""
    n = V3(tab_ref[s, PG_NX], tab_ref[s, PG_NY], tab_ref[s, PG_NZ])
    t = (tab_ref[s, PG_CN] - n.dot(o)) / n.dot(d)
    f1 = V3(tab_ref[s, PG_F1X], tab_ref[s, PG_F1Y], tab_ref[s, PG_F1Z])
    f2 = V3(tab_ref[s, PG_F2X], tab_ref[s, PG_F2Y], tab_ref[s, PG_F2Z])
    a = (f1.dot(o) - tab_ref[s, PG_K1]) + t * f1.dot(d)
    b = (f2.dot(o) - tab_ref[s, PG_K2]) + t * f2.dot(d)
    if tri:
        inside = (a >= 0) & (b >= 0) & (a + b <= 1.0)
    else:
        inside = (a >= 0) & (a <= 1.0) & (b >= 0) & (b <= 1.0)
    return t, inside, n


def _disk_row_test(tab_ref, s, o: V3, d: V3):
    n = V3(tab_ref[s, DG_NX], tab_ref[s, DG_NY], tab_ref[s, DG_NZ])
    t = (tab_ref[s, DG_CN] - n.dot(o)) / n.dot(d)
    p0 = V3(tab_ref[s, DG_PX], tab_ref[s, DG_PY], tab_ref[s, DG_PZ])
    hp = o + d * t
    inside = (hp - p0).length_squared() <= tab_ref[s, DG_R2]
    return t, inside, n


def _sphere_row_parts(tab_ref, s, o: V3, d: V3):
    """Cancellation-free quadratic setup, bitwise-matching the baked
    kernel's _closest_hit: the naive discr = r^2 - |oc|^2 + (oc.d)^2
    loses ~|oc|^2 * eps absolutely, which at a grazing hit far from the
    origin fakes/shifts roots by O(0.1 r) — the hit normal then comes out
    non-unit, the shading frame skews, and pow(cos_alpha > 1, exponent)
    overflows downstream. perp-decomposition keeps the error local."""
    c = V3(tab_ref[s, SG_CX], tab_ref[s, SG_CY], tab_ref[s, SG_CZ])
    r = tab_ref[s, SG_R]
    oc = c - o
    neg_b = oc.dot(d)
    perp = oc - d * neg_b
    discr = r * r - perp.length_squared()
    cc = oc.length_squared() - r * r
    return c, r, cc, neg_b, discr


def _fori(n_rows, body, carry):
    """Unrolled-by-UNROLL fori_loop over padded table rows."""
    if n_rows == 0:
        return carry

    def outer(i, cy):
        for k in range(UNROLL):
            cy = body(i * UNROLL + k, cy)
        return cy

    return jax.lax.fori_loop(0, n_rows // UNROLL, outer, carry)


def _fori_culled(n_rows, body, carry, block_pred):
    """_fori, but each UNROLL-row block is skipped entirely (lax.cond —
    a real branch on this TPU, measured 5.5x faster when false:
    benchmarks/cull_probe.py) when block_pred(i) says no ray can meet
    the block's bounding sphere."""
    if n_rows == 0:
        return carry
    if block_pred is None:
        return _fori(n_rows, body, carry)

    def outer(i, cy):
        def run(c):
            for k in range(UNROLL):
                c = body(i * UNROLL + k, c)
            return c

        return jax.lax.cond(block_pred(i), run, lambda c: c, cy)

    return jax.lax.fori_loop(0, n_rows // UNROLL, outer, carry)


def _ray_cone(o: V3, d: V3, extra_ro=0.0):
    """Scalar bounding cone of a tile's rays: origins inside the sphere
    (O, ro), unit directions within angle acos(cos_min) of axis a. All
    eight values are rank-0 (full-plane reductions happen ONCE per sweep;
    per-block tests are then pure scalar math)."""
    xlo, xhi = jnp.min(o.x), jnp.max(o.x)
    ylo, yhi = jnp.min(o.y), jnp.max(o.y)
    zlo, zhi = jnp.min(o.z), jnp.max(o.z)
    ox = (xlo + xhi) * 0.5
    oy = (ylo + yhi) * 0.5
    oz = (zlo + zhi) * 0.5
    ro = jnp.sqrt((xhi - xlo) ** 2 + (yhi - ylo) ** 2
                  + (zhi - zlo) ** 2) * 0.5 + np.float32(extra_ro)
    sx, sy, sz = jnp.sum(d.x), jnp.sum(d.y), jnp.sum(d.z)
    sl = jnp.sqrt(sx * sx + sy * sy + sz * sz)
    inv = np.float32(1.0) / jnp.maximum(sl, np.float32(1e-20))
    ax, ay, az = sx * inv, sy * inv, sz * inv
    cos_min = jnp.min(ax * d.x + ay * d.y + az * d.z)
    sin_min = jnp.sqrt(jnp.maximum(np.float32(1.0) - cos_min * cos_min,
                                   np.float32(0.0)))
    # non-finite inputs must disable culling, not mis-cull: a NaN poisons
    # cos_min, and every comparison on it is False — detect and force the
    # "always hit" state (cos_min = -1)
    fin = jnp.isfinite(ox + oy + oz + ro + cos_min)
    cos_min = jnp.where(fin, cos_min, np.float32(-1.0))
    sin_min = jnp.where(fin, sin_min, np.float32(0.0))
    ro = jnp.where(fin, ro, np.float32(np.inf))
    return (ox, oy, oz, ro, ax, ay, az, cos_min, sin_min)


def _cone_hits_block(cone, bref, i, tmax=None):
    """Conservative scalar test: can ANY ray of the cone meet block i's
    bounding sphere? (Supporting-halfspace distance bound — skips only
    when the true distance to the cone exceeds R, so culling never
    changes the image.) tmax (scalar) additionally prunes blocks farther
    than the longest ray."""
    ox, oy, oz, ro, ax, ay, az, cos_min, sin_min = cone
    cx, cy_, cz, r = bref[i, 0], bref[i, 1], bref[i, 2], bref[i, 3]
    R = r + ro
    vx, vy, vz = cx - ox, cy_ - oy, cz - oz
    d2 = vx * vx + vy * vy + vz * vz
    a1 = vx * ax + vy * ay + vz * az
    e = jnp.sqrt(jnp.maximum(d2 - a1 * a1, np.float32(0.0)))
    dist = cos_min * e - sin_min * a1
    hit = (d2 <= R * R) | (dist <= R)
    # obtuse cones are non-convex — the halfspace bound is invalid there,
    # so fall back to "always hit" (no culling when rays are incoherent)
    hit = hit | (cos_min <= np.float32(0.0))
    hit = hit & (r >= np.float32(0.0))      # r < 0 marks all-padding blocks
    if tmax is not None:
        hit = hit & (d2 <= (R + tmax) * (R + tmax))
    return hit


def _closest_hit_tables(refs, counts, o: V3, d: V3, bounds=None):
    """Table-sweep closest hit. Returns the _Carry tuple (+ valid mask).

    bounds: optional (tri_b, rect_b, disk_b, sph_b) SMEM block-bound refs —
    enables the per-block cone cull (exact-conservative; identical
    results, fewer row tests on coherent tiles)."""
    tri_ref, rect_ref, disk_ref, sph_ref = refs
    carry = _Carry.init(o.x.shape)
    preds = [None] * 4
    if bounds is not None:
        cone = _ray_cone(o, d)
        preds = [
            (lambda i, b=b: _cone_hits_block(cone, b, i))
            if b is not None else None for b in bounds]

    def planar_body(tri, geo_cols):
        def body(s, cy):
            ref = tri_ref if tri else rect_ref
            t, inside, n = _planar_row_test(ref, s, o, d, tri)
            t_best = cy[0]
            accept = inside & (t > km.SHAPE_EPSILON) & (t < t_best)
            if not tri:
                flip = n.dot(d) > 0
                n = V3(jnp.where(flip, -n.x, n.x),
                       jnp.where(flip, -n.y, n.y),
                       jnp.where(flip, -n.z, n.z))
            mat = [ref[s, geo_cols + c] for c in range(MAT_COLS)]
            return _Carry.select(cy, accept, t, n, mat)
        return body

    carry = _fori_culled(counts["tri"], planar_body(True, PLANAR_GEO_COLS),
                         carry, preds[0])
    carry = _fori_culled(counts["rect"],
                         planar_body(False, PLANAR_GEO_COLS), carry,
                         preds[1])

    def disk_body(s, cy):
        t, inside, n = _disk_row_test(disk_ref, s, o, d)
        accept = inside & (t > km.SHAPE_EPSILON) & (t < cy[0])
        mat = [disk_ref[s, DISK_GEO_COLS + c] for c in range(MAT_COLS)]
        return _Carry.select(cy, accept, t, n, mat)

    carry = _fori_culled(counts["disk"], disk_body, carry, preds[2])

    def sph_body(s, cy):
        c, r, cc, neg_b, discr = _sphere_row_parts(sph_ref, s, o, d)
        sq = wf._safe_sqrt(discr)
        sgn = jnp.where(neg_b >= 0.0, np.float32(1.0), np.float32(-1.0))
        q = neg_b + sgn * sq
        tq = cc / q    # raw div: q==0 -> inf/nan, rejected by the gates
        t1 = jnp.minimum(q, tq)
        t2 = jnp.maximum(q, tq)
        t1_ok = t1 > km.SHAPE_EPSILON
        t = jnp.where(t1_ok, t1, t2)
        accept = (discr >= 0) & (r > 0) \
            & (t1_ok | (t2 > km.SHAPE_EPSILON)) & (t < cy[0])
        n = (o + d * t - c) * (np.float32(1.0) / jnp.maximum(r, 1e-20))
        mat = [sph_ref[s, SPHERE_GEO_COLS + c] for c in range(MAT_COLS)]
        return _Carry.select(cy, accept, t, n, mat)

    carry = _fori_culled(counts["sphere"], sph_body, carry, preds[3])
    return carry


def _any_hit_tables(refs, counts, hp: V3, n_shade: V3, rays,
                    robust: bool = False, own=None, bounds=None, nd=None):
    """Merged K-ray occlusion over the tables (geometry columns only);
    the wavefront._any_hit_multi algebra with traced per-row scalars.

    The hit accumulators are fori_loop CARRIES, so they live as int32
    planes (Mosaic cannot materialize bool vectors); masks inside the body
    stay compare-born. Returns K bool masks.

    own: per-ray (table kind, table row) of the sampled light's own
    geometry, or None — the robust shadow mode gates that row out of ray
    k's sweep with a scalar loop-index compare."""
    tri_ref, rect_ref, disk_ref, sph_ref = refs
    eps = km.SHAPE_EPSILON
    K = len(rays)
    if nd is None:
        nd = [n_shade.dot(wi) for wi, _ in rays]
    se = [jnp.where(nd[k] < 0.0, np.float32(-km.RAY_OFFSET),
                    np.float32(km.RAY_OFFSET)) for k in range(K)]
    if robust:
        # KernelConfig(shadow="robust"): tmax from the actual offset origin
        # (first-order; see wavefront._any_hit_multi)
        rays = [(rays[k][0], rays[k][1] - se[k] * nd[k]) for k in range(K)]
    one = np.int32(1)
    hits = tuple(jnp.zeros(hp.x.shape, jnp.int32) for _ in range(K))

    preds = [None] * 4
    if bounds is not None:
        # one cone per shadow ray (origins = the tile's shading points,
        # inflated by the origin offset; tmax prunes blocks beyond the
        # farthest light sample). A block is swept if ANY ray's cone can
        # reach it — shadow cones toward compact lights are tight, so
        # most blocks skip even on incoherent bounces.
        cones = [(_ray_cone(hp, wi, extra_ro=km.RAY_OFFSET),
                  jnp.max(jnp.where(jnp.isnan(tmax), np.float32(np.inf),
                                    tmax))) for wi, tmax in rays]

        def union_pred(b):
            def pred(i):
                h = None
                for cone, tm in cones:
                    hk = _cone_hits_block(cone, b, i, tmax=tm)
                    h = hk if h is None else (h | hk)
                return h
            return pred

        preds = [union_pred(b) if b is not None else None for b in bounds]

    def planar_body(tri):
        ref = tri_ref if tri else rect_ref

        def body(s, hs):
            n = V3(ref[s, PG_NX], ref[s, PG_NY], ref[s, PG_NZ])
            f1 = V3(ref[s, PG_F1X], ref[s, PG_F1Y], ref[s, PG_F1Z])
            f2 = V3(ref[s, PG_F2X], ref[s, PG_F2Y], ref[s, PG_F2Z])
            num_h = ref[s, PG_CN] - n.dot(hp)
            num_n = n.dot(n_shade)
            a_h = f1.dot(hp) - ref[s, PG_K1]
            a_n = f1.dot(n_shade)
            b_h = f2.dot(hp) - ref[s, PG_K2]
            b_n = f2.dot(n_shade)
            name = "tri" if tri else "rect"
            out = []
            for k in range(K):
                wi, tmax = rays[k]
                t = (num_h - se[k] * num_n) / n.dot(wi)
                a = (a_h + se[k] * a_n) + t * f1.dot(wi)
                b = (b_h + se[k] * b_n) + t * f2.dot(wi)
                if tri:
                    inside = (a >= 0) & (b >= 0) & (a + b <= 1.0)
                else:
                    inside = (a >= 0) & (a <= 1.0) & (b >= 0) & (b <= 1.0)
                h = inside & (t > eps) & (t < tmax)
                if own is not None and own[k] is not None \
                        and own[k][0] == name:
                    h = h & (s != np.int32(own[k][1]))
                out.append(jnp.where(h, one, hs[k]))
            return tuple(out)
        return body

    hits = _fori_culled(counts["tri"], planar_body(True), hits,
                        preds[0])
    hits = _fori_culled(counts["rect"], planar_body(False), hits,
                        preds[1])

    def disk_body(s, hs):
        n = V3(disk_ref[s, DG_NX], disk_ref[s, DG_NY], disk_ref[s, DG_NZ])
        p0 = V3(disk_ref[s, DG_PX], disk_ref[s, DG_PY], disk_ref[s, DG_PZ])
        num_h = disk_ref[s, DG_CN] - n.dot(hp)
        num_n = n.dot(n_shade)
        r2 = disk_ref[s, DG_R2]
        out = []
        for k in range(K):
            wi, tmax = rays[k]
            t = (num_h - se[k] * num_n) / n.dot(wi)
            o_k = hp + n_shade * se[k]
            rel = o_k + wi * t - p0
            inside = rel.length_squared() <= r2
            h = inside & (t > eps) & (t < tmax)
            if own is not None and own[k] is not None \
                    and own[k][0] == "disk":
                h = h & (s != np.int32(own[k][1]))
            out.append(jnp.where(h, one, hs[k]))
        return tuple(out)

    hits = _fori_culled(counts["disk"], disk_body, hits, preds[2])
    off2 = np.float32(km.RAY_OFFSET * km.RAY_OFFSET)

    def sph_body(s, hs):
        c = V3(sph_ref[s, SG_CX], sph_ref[s, SG_CY], sph_ref[s, SG_CZ])
        r = sph_ref[s, SG_R]
        vc = c - hp
        vc2 = vc.length_squared()
        vcn = vc.dot(n_shade)
        out = []
        for k in range(K):
            wi, tmax = rays[k]
            neg_b = vc.dot(wi) - se[k] * nd[k]
            oc2 = vc2 - 2.0 * se[k] * vcn + off2
            discr = r * r - oc2 + neg_b * neg_b
            # sqrt-free root-in-range test (wavefront._any_hit_multi)
            a_c = neg_b - eps
            b_c = neg_b - tmax
            a2 = a_c * a_c
            b2 = b_c * b_c
            a_pos = a_c > 0.0
            b_neg = b_c < 0.0
            in1 = a_pos & (discr < a2) & (b_neg | (discr > b2))
            in2 = (a_pos | (discr > a2)) & b_neg & (discr < b2)
            h = (discr >= 0) & (r > 0) & (in1 | in2)
            if own is not None and own[k] is not None \
                    and own[k][0] == "sphere":
                h = h & (s != np.int32(own[k][1]))
            out.append(jnp.where(h, one, hs[k]))
        return tuple(out)

    hits = _fori_culled(counts["sphere"], sph_body, hits, preds[3])
    return [h != 0 for h in hits]


_PREC = jax.lax.Precision.HIGHEST   # f32 multi-pass; DEFAULT is 1-pass bf16


def _mxu_dot(W, P):
    """(M, 3) @ (3, 128) on the MXU with full-f32 passes."""
    return jax.lax.dot_general(
        W, P, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_PREC)


def _resolve_sweep(cfg: wf.KernelConfig, counts) -> bool:
    """cfg.sweep -> use_mxu. "auto" = mxu past 64 surfaces: below that the
    baked kernel exists and tests assert bitwise table==baked parity, which
    the matmul's last-ulp rounding would break; above it the mxu sweep is
    4-8x (benchmarks/mxu_probe.py)."""
    if cfg.sweep == "mxu":
        return True
    if cfg.sweep == "scalar":
        return False
    return sum(counts.values()) > 64


def _row_pair(v3: V3, r):
    """(3, 128) coordinate matrix of lane-row r of a (ROWS, 128) V3."""
    return jnp.concatenate([v3.x[r:r + 1, :], v3.y[r:r + 1, :],
                            v3.z[r:r + 1, :]], axis=0)


def _subl_best(tc, base, iota, best_t, best_row):
    """Fold the (S, 128) candidate t's of one class into the running
    per-lane best. Ties: lowest row in class, earliest class — matching
    the scalar sweep's strict `t < t_best` accept order."""
    tmin = jnp.min(tc, axis=0, keepdims=True)                   # (1,128)
    win = jnp.min(jnp.where(tc == tmin, iota, np.int32(2 ** 30)),
                  axis=0, keepdims=True)
    upd = tmin < best_t
    best_row = jnp.where(upd, win + np.int32(base), best_row)
    best_t = jnp.where(upd, tmin, best_t)
    return best_t, best_row


SBLK = 64    # epilogue surface-block: (64,128) intermediates stay in
             # vregs; full-(S,128) epilogues spill to VMEM and run 3-4x
             # slower (the round-3 sublane-sweep pathology)


def _chunk_rows(n_rows, S, n_vecs):
    """Lane-rows per batched matmul: keep the (S, n_vecs*chunk*128) f32
    result ~<8 MB of VMEM while minimizing call count (each HIGHEST-pass
    matmul call costs ~0.5 ms of overhead at N=128 — measured
    overhead-bound by 10x, benchmarks/mxu_probe.py)."""
    budget = 512 * 1024      # ~2 MB: the 16 MB scoped-vmem limit must
    c = max(1, budget // max(S * n_vecs * LANE, 1))   # also hold the
    return int(min(n_rows, c))                        # transport state


def _closest_hit_tables_mxu(refs, counts, o: V3, d: V3):
    """MXU-form closest hit: same carry as _closest_hit_tables.

    The per-surface-constant dot products run as (S,3)@(3,N) matmuls on
    the MXU (full-f32 HIGHEST passes; surfaces in sublanes, lane-rows
    batched along N), the root/inside epilogue is (S,128) elementwise per
    lane-row, the class/row winner comes from a sublane min+argmin, and
    the winner's geometry+material columns are gathered with EXACT
    one-hot matmuls (a one-hot gather is exact under HIGHEST: the bf16
    split of each table value reassembles under 1.0/0.0 weights).
    Family operands are separate (S,3) column slices — Mosaic cannot
    concatenate slices with different lane offsets but takes them as
    matmul operands directly.

    The sphere selection uses the matmul (naive) discriminant — its
    |oc|^2*eps cancellation tail can flip ~1e-4 of grazing winners vs the
    scalar sweep — and the winner's t and normal are then RECOMPUTED per
    lane in the stable perp-decomposition form, which is what makes the
    naive form safe (the round-2 NaN chain started from a non-unit
    normal, not from the winner pick). Block cone culls don't apply (a
    matmul has no blocks); the whole-tile dead skip still wraps this
    call."""
    tri_ref, rect_ref, disk_ref, sph_ref = refs
    eps = km.SHAPE_EPSILON
    INF = np.float32(np.inf)
    n_rows = o.x.shape[0]
    S_tri, S_rect = counts["tri"], counts["rect"]
    S_disk, S_sph = counts["disk"], counts["sphere"]
    base_rect = S_tri
    base_disk = S_tri + S_rect
    base_sph = base_disk + S_disk

    classes = []
    for name, ref, S, base in (("tri", tri_ref, S_tri, 0),
                               ("rect", rect_ref, S_rect, base_rect)):
        if not S:
            continue
        consts = (ref[:, PG_NX:PG_NZ + 1], ref[:, PG_F1X:PG_F1Z + 1],
                  ref[:, PG_F2X:PG_F2Z + 1], ref[:, PG_CN:PG_CN + 1],
                  ref[:, PG_K1:PG_K1 + 1], ref[:, PG_K2:PG_K2 + 1])
        classes.append(("planar", name, base, S, ref, consts))
    if S_disk:
        p0x = disk_ref[:, DG_PX:DG_PX + 1]
        p0y = disk_ref[:, DG_PY:DG_PY + 1]
        p0z = disk_ref[:, DG_PZ:DG_PZ + 1]
        consts = (disk_ref[:, DG_NX:DG_NZ + 1],
                  disk_ref[:, DG_PX:DG_PZ + 1],
                  disk_ref[:, DG_CN:DG_CN + 1],
                  p0x * p0x + p0y * p0y + p0z * p0z,
                  disk_ref[:, DG_R2:DG_R2 + 1])
        classes.append(("disk", "disk", base_disk, S_disk, disk_ref,
                        consts))
    if S_sph:
        rs_ = sph_ref[:, SG_R:SG_R + 1]
        c2 = (sph_ref[:, SG_CX:SG_CX + 1] ** 2
              + sph_ref[:, SG_CY:SG_CY + 1] ** 2
              + sph_ref[:, SG_CZ:SG_CZ + 1] ** 2)
        consts = (sph_ref[:, SG_CX:SG_CZ + 1], rs_, c2)
        classes.append(("sphere", "sphere", base_sph, S_sph, sph_ref,
                        consts))

    Po = [_row_pair(o, r) for r in range(n_rows)]
    Pd = [_row_pair(d, r) for r in range(n_rows)]
    od = [jnp.sum(Po[r] * Pd[r], axis=0, keepdims=True)
          for r in range(n_rows)]
    o2 = [jnp.sum(Po[r] * Po[r], axis=0, keepdims=True)
          for r in range(n_rows)]
    best_t = [jnp.full((1, LANE), INF) for _ in range(n_rows)]
    best_row = [jnp.full((1, LANE), np.int32(-1)) for _ in range(n_rows)]

    for kind, name, base, S, ref, consts in classes:
        iota = jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 0)
        chunk = _chunk_rows(n_rows, S, 2)
        for r0 in range(0, n_rows, chunk):
            rr = list(range(r0, min(r0 + chunk, n_rows)))
            c = len(rr)
            Ps = jnp.concatenate([Po[r] for r in rr]
                                 + [Pd[r] for r in rr], axis=1)

            def sl(D, j, off=0):
                return D[:, (off * c + j) * LANE:(off * c + j + 1) * LANE]

            if kind == "planar":
                Wn, Wf1, Wf2, cn, k1, k2 = consts
                Dn = _mxu_dot(Wn, Ps)
                Df1 = _mxu_dot(Wf1, Ps)
                Df2 = _mxu_dot(Wf2, Ps)
                for j, r in enumerate(rr):
                    for s0 in range(0, S, SBLK):
                        s1 = min(s0 + SBLK, S)
                        sb = slice(s0, s1)
                        ib = iota[0:s1 - s0]
                        t = (cn[sb] - sl(Dn, j)[sb]) / sl(Dn, j, 1)[sb]
                        a = (sl(Df1, j)[sb] - k1[sb]) \
                            + t * sl(Df1, j, 1)[sb]
                        b = (sl(Df2, j)[sb] - k2[sb]) \
                            + t * sl(Df2, j, 1)[sb]
                        if name == "tri":
                            inside = (a >= 0) & (b >= 0) & (a + b <= 1.0)
                        else:
                            inside = (a >= 0) & (a <= 1.0) \
                                & (b >= 0) & (b <= 1.0)
                        tc = jnp.where(inside & (t > eps), t, INF)
                        best_t[r], best_row[r] = _subl_best(
                            tc, base + s0, ib, best_t[r], best_row[r])
            elif kind == "disk":
                Wn, Wp, cn, p02, r2 = consts
                Dn = _mxu_dot(Wn, Ps)
                Dp = _mxu_dot(Wp, Ps)
                for j, r in enumerate(rr):
                    for s0 in range(0, S, SBLK):
                        s1 = min(s0 + SBLK, S)
                        sb = slice(s0, s1)
                        ib = iota[0:s1 - s0]
                        t = (cn[sb] - sl(Dn, j)[sb]) / sl(Dn, j, 1)[sb]
                        rel2 = (o2[r] - 2.0 * sl(Dp, j)[sb] + p02[sb]) \
                            + 2.0 * t * (od[r] - sl(Dp, j, 1)[sb]) + t * t
                        tc = jnp.where((rel2 <= r2[sb]) & (t > eps),
                                       t, INF)
                        best_t[r], best_row[r] = _subl_best(
                            tc, base + s0, ib, best_t[r], best_row[r])
            else:
                Wc, rs_, c2 = consts
                Dc = _mxu_dot(Wc, Ps)
                for j, r in enumerate(rr):
                    for s0 in range(0, S, SBLK):
                        s1 = min(s0 + SBLK, S)
                        sb = slice(s0, s1)
                        ib = iota[0:s1 - s0]
                        rb_ = rs_[sb]
                        neg_b = sl(Dc, j, 1)[sb] - od[r]
                        oc2 = c2[sb] - 2.0 * sl(Dc, j)[sb] + o2[r]
                        discr = rb_ * rb_ - oc2 + neg_b * neg_b
                        cc = oc2 - rb_ * rb_
                        sq = jnp.sqrt(jnp.maximum(discr, 0.0))
                        sgn = jnp.where(neg_b >= 0.0, np.float32(1.0),
                                        np.float32(-1.0))
                        q = neg_b + sgn * sq
                        tq = cc / q
                        t1 = jnp.minimum(q, tq)
                        t2 = jnp.maximum(q, tq)
                        t1_ok = t1 > eps
                        t = jnp.where(t1_ok, t1, t2)
                        ok = (discr >= 0) & (rb_ > 0) \
                            & (t1_ok | (t2 > eps))
                        tc = jnp.where(ok, t, INF)
                        best_t[r], best_row[r] = _subl_best(
                            tc, base + s0, ib, best_t[r], best_row[r])

    # ---- winner resolve: exact chunked one-hot gathers ----
    geo_rows = [jnp.zeros((3, LANE), jnp.float32) for _ in range(n_rows)]
    srad_rows = [jnp.zeros((1, LANE), jnp.float32) for _ in range(n_rows)]
    mat_rows = [jnp.zeros((MAT_COLS, LANE), jnp.float32)
                for _ in range(n_rows)]
    for kind, name, base, S, ref, consts in classes:
        n_cols = ref.shape[1]
        chunk = _chunk_rows(n_rows, S, 1)
        for r0 in range(0, n_rows, chunk):
            rr = list(range(r0, min(r0 + chunk, n_rows)))
            c = len(rr)
            loc = jnp.concatenate([best_row[r] for r in rr], axis=1) \
                - np.int32(base)
            iota_c = jax.lax.broadcasted_iota(jnp.int32, (S, c * LANE), 0)
            oh = jnp.where(iota_c == loc, np.float32(1.0), np.float32(0.0))
            colsT = jax.lax.dot_general(
                ref[:, :], oh, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_PREC)
            for j, r in enumerate(rr):
                csl = colsT[:, j * LANE:(j + 1) * LANE]
                if kind == "sphere":
                    geo_rows[r] = geo_rows[r] + csl[SG_CX:SG_CZ + 1]
                    srad_rows[r] = srad_rows[r] + csl[SG_R:SG_R + 1]
                    mat_rows[r] = mat_rows[r] + csl[
                        SPHERE_GEO_COLS:SPHERE_GEO_COLS + MAT_COLS]
                elif kind == "disk":
                    geo_rows[r] = geo_rows[r] + csl[DG_NX:DG_NZ + 1]
                    mat_rows[r] = mat_rows[r] + csl[
                        DISK_GEO_COLS:DISK_GEO_COLS + MAT_COLS]
                else:
                    geo_rows[r] = geo_rows[r] + csl[PG_NX:PG_NZ + 1]
                    mat_rows[r] = mat_rows[r] + csl[
                        PLANAR_GEO_COLS:PLANAR_GEO_COLS + MAT_COLS]

    t = jnp.concatenate(best_t, axis=0)                    # (ROWS,128)
    grow = jnp.concatenate(best_row, axis=0)
    gx = jnp.concatenate([g[0:1] for g in geo_rows], axis=0)
    gy = jnp.concatenate([g[1:2] for g in geo_rows], axis=0)
    gz = jnp.concatenate([g[2:3] for g in geo_rows], axis=0)
    sr = jnp.concatenate(srad_rows, axis=0)
    mat = [jnp.concatenate([m[cc:cc + 1] for m in mat_rows], axis=0)
           for cc in range(MAT_COLS)]

    # ---- winner post-pass on full planes ----
    is_sph = grow >= np.int32(base_sph)
    if S_sph:
        # stable perp-decomposition recompute of the winner's t; the
        # sphere normal then comes out unit-length by construction
        c = V3(gx, gy, gz)
        oc = c - o
        neg_b = oc.dot(d)
        perp = oc - d * neg_b
        discr = sr * sr - perp.length_squared()
        cc = oc.length_squared() - sr * sr
        sq = jnp.sqrt(jnp.maximum(discr, 0.0))
        sgn = jnp.where(neg_b >= 0.0, np.float32(1.0), np.float32(-1.0))
        q = neg_b + sgn * sq
        tq = cc / q
        t1 = jnp.minimum(q, tq)
        t2 = jnp.maximum(q, tq)
        t1_ok = t1 > eps
        tp = jnp.where(t1_ok, t1, t2)
        tp = jnp.where(jnp.isfinite(tp) & (tp > eps), tp, INF)
        t = jnp.where(is_sph, tp, t)
        inv_r = np.float32(1.0) / jnp.maximum(sr, np.float32(1e-20))
        n_sp = (o + d * jnp.where(jnp.isfinite(t), t, 1.0) - c) * inv_r
        nx = jnp.where(is_sph, n_sp.x, gx)
        ny = jnp.where(is_sph, n_sp.y, gy)
        nz = jnp.where(is_sph, n_sp.z, gz)
    else:
        nx, ny, nz = gx, gy, gz
    if S_rect:
        # two-sided rects: flip the winner's normal toward the ray
        is_rect = (grow >= np.int32(base_rect)) \
            & (grow < np.int32(base_disk))
        flip = is_rect & (nx * d.x + ny * d.y + nz * d.z > 0)
        nx = jnp.where(flip, -nx, nx)
        ny = jnp.where(flip, -ny, ny)
        nz = jnp.where(flip, -nz, nz)

    miss = grow < 0
    t = jnp.where(miss, INF, t)
    vals = dict(t=t, nx=nx, ny=ny, nz=nz,
                difx=mat[M_DIFX], dify=mat[M_DIFY], difz=mat[M_DIFZ],
                spcx=mat[M_SPCX], spcy=mat[M_SPCY], spcz=mat[M_SPCZ],
                emix=mat[M_EMIX], emiy=mat[M_EMIY], emiz=mat[M_EMIZ],
                kind=mat[M_KIND], exp=mat[M_EXP], eta=mat[M_ETA],
                sprob=mat[M_SPROB], dprob=mat[M_DPROB], lix=mat[M_LIX],
                row=mat[M_ROW])
    # misses must carry the scalar sweep's init values (lix/row = -1)
    vals["lix"] = jnp.where(miss, np.float32(-1.0), vals["lix"])
    vals["row"] = jnp.where(miss, np.float32(-1.0), vals["row"])
    return tuple(vals[f] for f in _Carry.FIELDS)


def _any_hit_tables_mxu(refs, counts, hp: V3, n_shade: V3, rays,
                        robust: bool = False, own=None, nd=None):
    """MXU-form merged K-ray occlusion (same semantics as
    _any_hit_tables, no block culls): per lane-row, surface-constant dots
    against hp / n_shade / each ray direction run as batched matmuls and
    the range/inside epilogue is (S,128) elementwise with a sublane
    any(). The K+2 per-lane vectors of a row chunk share one matmul per
    family."""
    tri_ref, rect_ref, disk_ref, sph_ref = refs
    eps = km.SHAPE_EPSILON
    K = len(rays)
    n_rows = hp.x.shape[0]
    if nd is None:
        nd = [n_shade.dot(wi) for wi, _ in rays]
    se = [jnp.where(nd[k] < 0.0, np.float32(-km.RAY_OFFSET),
                    np.float32(km.RAY_OFFSET)) for k in range(K)]
    if robust:
        rays = [(rays[k][0], rays[k][1] - se[k] * nd[k]) for k in range(K)]
    off2 = np.float32(km.RAY_OFFSET * km.RAY_OFFSET)

    def own_row(kind_name, k):
        if own is not None and own[k] is not None \
                and own[k][0] == kind_name:
            return np.int32(own[k][1])
        return None

    classes = []
    for name, ref, S in (("tri", tri_ref, counts["tri"]),
                         ("rect", rect_ref, counts["rect"])):
        if not S:
            continue
        consts = (ref[:, PG_NX:PG_NZ + 1], ref[:, PG_F1X:PG_F1Z + 1],
                  ref[:, PG_F2X:PG_F2Z + 1], ref[:, PG_CN:PG_CN + 1],
                  ref[:, PG_K1:PG_K1 + 1], ref[:, PG_K2:PG_K2 + 1])
        classes.append(("planar", name, S, consts))
    if counts["disk"]:
        S = counts["disk"]
        p0x = disk_ref[:, DG_PX:DG_PX + 1]
        p0y = disk_ref[:, DG_PY:DG_PY + 1]
        p0z = disk_ref[:, DG_PZ:DG_PZ + 1]
        consts = (disk_ref[:, DG_NX:DG_NZ + 1],
                  disk_ref[:, DG_PX:DG_PZ + 1],
                  disk_ref[:, DG_CN:DG_CN + 1],
                  p0x * p0x + p0y * p0y + p0z * p0z,
                  disk_ref[:, DG_R2:DG_R2 + 1])
        classes.append(("disk", "disk", S, consts))
    if counts["sphere"]:
        S = counts["sphere"]
        rs_ = sph_ref[:, SG_R:SG_R + 1]
        c2 = (sph_ref[:, SG_CX:SG_CX + 1] ** 2
              + sph_ref[:, SG_CY:SG_CY + 1] ** 2
              + sph_ref[:, SG_CZ:SG_CZ + 1] ** 2)
        classes.append(("sphere", "sphere", S,
                        (sph_ref[:, SG_CX:SG_CZ + 1], rs_, c2)))

    Ph = [_row_pair(hp, r) for r in range(n_rows)]
    Pn = [_row_pair(n_shade, r) for r in range(n_rows)]
    Pw = [[_row_pair(rays[k][0], r) for k in range(K)]
          for r in range(n_rows)]
    hp2 = [jnp.sum(Ph[r] * Ph[r], axis=0, keepdims=True)
           for r in range(n_rows)]
    hpn = [jnp.sum(Ph[r] * Pn[r], axis=0, keepdims=True)
           for r in range(n_rows)]
    hpw = [[jnp.sum(Ph[r] * Pw[r][k], axis=0, keepdims=True)
            for k in range(K)] for r in range(n_rows)]
    nsw = [[nd[k][r:r + 1, :] for k in range(K)] for r in range(n_rows)]
    se_r = [[se[k][r:r + 1, :] for k in range(K)] for r in range(n_rows)]
    tmax_r = [[rays[k][1][r:r + 1, :] for k in range(K)]
              for r in range(n_rows)]
    hits_r = [[jnp.zeros((1, LANE), jnp.float32) for _ in range(K)]
              for _ in range(n_rows)]

    def acc_hit(r, k, h):
        hits_r[r][k] = jnp.maximum(
            hits_r[r][k],
            jnp.max(jnp.where(h, np.float32(1.0), np.float32(0.0)),
                    axis=0, keepdims=True))

    n_vec = 2 + K
    for cls in classes:
        kind, name, S = cls[0], cls[1], cls[2]
        consts = cls[3]
        iota = jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 0)
        chunk = _chunk_rows(n_rows, S, n_vec)
        for r0 in range(0, n_rows, chunk):
            rr = list(range(r0, min(r0 + chunk, n_rows)))
            c = len(rr)
            Ps = jnp.concatenate(
                [Ph[r] for r in rr] + [Pn[r] for r in rr]
                + [Pw[r][k] for k in range(K) for r in rr], axis=1)

            def sl(D, j, off=0):
                return D[:, (off * c + j) * LANE:(off * c + j + 1) * LANE]

            if kind == "planar":
                Wn, Wf1, Wf2, cn, k1, k2 = consts
                Dn = _mxu_dot(Wn, Ps)
                Df1 = _mxu_dot(Wf1, Ps)
                Df2 = _mxu_dot(Wf2, Ps)
                for j, r in enumerate(rr):
                    for s0 in range(0, S, SBLK):
                        s1 = min(s0 + SBLK, S)
                        sb = slice(s0, s1)
                        ib = iota[0:s1 - s0]
                        num_h = cn[sb] - sl(Dn, j)[sb]
                        num_n = sl(Dn, j, 1)[sb]
                        a_h = sl(Df1, j)[sb] - k1[sb]
                        a_n = sl(Df1, j, 1)[sb]
                        b_h = sl(Df2, j)[sb] - k2[sb]
                        b_n = sl(Df2, j, 1)[sb]
                        for k in range(K):
                            t = (num_h - se_r[r][k] * num_n) \
                                / sl(Dn, j, 2 + k)[sb]
                            a = (a_h + se_r[r][k] * a_n) \
                                + t * sl(Df1, j, 2 + k)[sb]
                            b = (b_h + se_r[r][k] * b_n) \
                                + t * sl(Df2, j, 2 + k)[sb]
                            if name == "tri":
                                inside = (a >= 0) & (b >= 0) \
                                    & (a + b <= 1.0)
                            else:
                                inside = (a >= 0) & (a <= 1.0) \
                                    & (b >= 0) & (b <= 1.0)
                            h = inside & (t > eps) & (t < tmax_r[r][k])
                            orow = own_row(name, k)
                            if orow is not None:
                                h = h & (ib != orow - s0)
                            acc_hit(r, k, h)
            elif kind == "disk":
                Wn, Wp, cn, p02, r2c = consts
                Dn = _mxu_dot(Wn, Ps)
                Dp = _mxu_dot(Wp, Ps)
                for j, r in enumerate(rr):
                    for s0 in range(0, S, SBLK):
                        s1 = min(s0 + SBLK, S)
                        sb = slice(s0, s1)
                        ib = iota[0:s1 - s0]
                        num_h = cn[sb] - sl(Dn, j)[sb]
                        num_n = sl(Dn, j, 1)[sb]
                        q2_h = hp2[r] - 2.0 * sl(Dp, j)[sb] + p02[sb]
                        qn = hpn[r] - sl(Dp, j, 1)[sb]
                        for k in range(K):
                            t = (num_h - se_r[r][k] * num_n) \
                                / sl(Dn, j, 2 + k)[sb]
                            qw = hpw[r][k] - sl(Dp, j, 2 + k)[sb]
                            rel2 = q2_h + 2.0 * se_r[r][k] * qn \
                                + se_r[r][k] * se_r[r][k] \
                                + 2.0 * t * (qw + se_r[r][k] * nsw[r][k]) \
                                + t * t
                            h = (rel2 <= r2c[sb]) & (t > eps) \
                                & (t < tmax_r[r][k])
                            orow = own_row("disk", k)
                            if orow is not None:
                                h = h & (ib != orow - s0)
                            acc_hit(r, k, h)
            else:
                Wc, rs_, c2 = consts
                Dc = _mxu_dot(Wc, Ps)
                for j, r in enumerate(rr):
                    for s0 in range(0, S, SBLK):
                        s1 = min(s0 + SBLK, S)
                        sb = slice(s0, s1)
                        ib = iota[0:s1 - s0]
                        rb_ = rs_[sb]
                        vc2 = c2[sb] - 2.0 * sl(Dc, j)[sb] + hp2[r]
                        vcn = sl(Dc, j, 1)[sb] - hpn[r]
                        for k in range(K):
                            neg_b = (sl(Dc, j, 2 + k)[sb] - hpw[r][k]) \
                                - se_r[r][k] * nsw[r][k]
                            oc2 = vc2 - 2.0 * se_r[r][k] * vcn + off2
                            discr = rb_ * rb_ - oc2 + neg_b * neg_b
                            a_c = neg_b - eps
                            b_c = neg_b - tmax_r[r][k]
                            a2 = a_c * a_c
                            b2 = b_c * b_c
                            a_pos = a_c > 0.0
                            b_neg = b_c < 0.0
                            in1 = a_pos & (discr < a2) \
                                & (b_neg | (discr > b2))
                            in2 = (a_pos | (discr > a2)) & b_neg \
                                & (discr < b2)
                            h = (discr >= 0) & (rb_ > 0) & (in1 | in2)
                            orow = own_row("sphere", k)
                            if orow is not None:
                                h = h & (ib != orow - s0)
                            acc_hit(r, k, h)

    return [jnp.concatenate([hits_r[r][k] for r in range(n_rows)],
                            axis=0) > 0.0 for k in range(K)]


def _bigres_layout(cfg: wf.KernelConfig, L: int, has_env: bool,
                   has_img: bool = False):
    """Plane order of the table kernel's coefficient cache (the residual
    backward's input; the bigscene analog of wavefront._residual_layout).
    Per shading bounce: "wb" (emission-MIS weight, fully masked), "wenv"
    (env scenes), one "B" per NEE light ("Bk" kappa partners with
    trainable exponents), "tu"/"tuk", and the hit's table colors
    "dif"/"spc"/"emi" (3 planes each) — at thousands of surface rows the
    backward cannot re-select them from tables, so the forward caches the
    VALUES ("dif" holds the POST-texture diffuse on textured rows; the
    per-texture adjoint routing uses the parity bit / "tx"/"ty" planes,
    and the row-tagged diffuse share is zeroed there). With image
    textures ("tx"/"ty") the continuous texel coordinates of the hit are
    cached per bounce, exactly as wavefront._residual_layout. The horizon
    bounce stores only wb/wenv/emi. The per-bounce int plane packs
    (row+1) | phong<<20 | to_spec<<21 | checker_even<<22."""
    texp = cfg.trainable_exponent
    tags = []
    for b in range(cfg.max_depth + 1):
        tags.append(("wb", b))
        if has_env:
            tags.append(("wenv", b))
        for c in range(3):
            tags.append(("emi", b, c))
        if b < cfg.max_depth:
            for i in range(L):
                tags.append(("B", b, i))
                if texp:
                    tags.append(("Bk", b, i))
            tags.append(("tu", b))
            if texp:
                tags.append(("tuk", b))
            for c in range(3):
                tags.append(("dif", b, c))
            for c in range(3):
                tags.append(("spc", b, c))
            if has_img:
                tags.append(("tx", b))
                tags.append(("ty", b))
    return {t: i for i, t in enumerate(tags)}, len(tags)


def _make_kernel(static, counts, cfg: wf.KernelConfig, hw_rng: bool,
                 grad: bool = False, residual: bool = False):
    """Forward transport over the geometry/material tables — the
    single-sample-MIS estimator of wavefront._make_kernel (ky.cpp
    path_tracing_iteration_t semantics) with every per-surface-row select
    replaced by the carried hit-record columns.

    grad=True builds the path-replay backward (same structure as the baked
    kernel's grad mode, wavefront.py:1571-2192): it re-runs the transport
    on the same RNG stream carrying the tail radiance
    R_{b+1} = (R_b - E_b)/T_b, and instead of per-material-row VMEM
    accumulators (impossible at thousands of rows) it WRITES per-bounce
    per-lane adjoint-contribution planes tagged with the hit row — the
    caller segment-sums them into the (M, 3) gradients outside the kernel
    (one one-hot matmul on the MXU). Output layout (dout, stacked planes):
      bounce b in [0, max_depth):  9 planes [dd.xyz, ds.xyz, de.xyz]
      horizon bounce:              3 planes [de.xyz]
      then 3 planes d_env and 3*L planes d_light_emit (per-lane sums over
      bounces; L = len(lights)); rows_out: (max_depth+1) int32 planes of
      sid+1 (0 = miss)."""
    lights = static["lights"]
    L = len(lights)
    world_radius = static["world_radius"]
    # statically-present lobes from the scene's material kinds
    mk = set(static["mats"]["kind"])
    lobes = set()
    if kbsdf.MAT_MATTE in mk or kbsdf.MAT_PLASTIC in mk:
        lobes.add(kbsdf.LAMBERT)
    if kbsdf.MAT_PLASTIC in mk:
        lobes.add(kbsdf.PHONG)
    if kbsdf.MAT_MIRROR in mk:
        lobes.add(kbsdf.MIRROR)
    if kbsdf.MAT_GLASS in mk:
        lobes.add(kbsdf.GLASS)
    lobes = frozenset(lobes)
    eval_lobes = lobes & {kbsdf.LAMBERT, kbsdf.PHONG}
    has_plastic = kbsdf.MAT_PLASTIC in mk
    has_delta = bool(lobes & {kbsdf.MIRROR, kbsdf.GLASS})
    env_i = next((i for i, lt in enumerate(lights)
                  if lt["kind"] == klights.ENV), None)
    use_sobol = cfg.sampler == "sobol"
    use_hash = cfg.sampler == "hash"
    use_texp = cfg.trainable_exponent
    tex_recs = static.get("textures", [])
    img_recs = [r for r in tex_recs if r.get("kind") == "image"]
    n_tex = static.get("n_textures", 0)
    n_texels = static.get("n_texels", 0)
    # robust shadow mode: per-light (table, row) of its own geometry
    own_geo = None
    if cfg.shadow == "robust":
        li_of = static["mats"]["light_index"]
        own_of_light = {}
        for m, li in enumerate(li_of):
            if li >= 0 and li not in own_of_light:
                own_of_light[li] = static["table_of_row"].get(m)
        own_geo = [own_of_light.get(i) for i in range(L)]

    use_cull = cfg.cull != "off"
    use_mxu = _resolve_sweep(cfg, counts)

    def kernel(seed_ref, tri_ref, rect_ref, disk_ref, sph_ref,
               *rest_refs):
        out_refs = list(rest_refs)
        texa_ref = out_refs.pop(0) if tex_recs else None
        texb_ref = out_refs.pop(0) if tex_recs else None
        timg_ref = out_refs.pop(0) if img_recs else None
        if use_cull:
            # per-UNROLL-block bounding spheres (SMEM) for the cone cull
            bounds = tuple(
                (out_refs.pop(0) if counts[k] else None)
                for k in ("tri", "rect", "disk", "sphere"))
        else:
            bounds = None
        (light_emit_ref, env_ref,
         ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref) = out_refs[:8]
        out_refs = out_refs[8:]
        refs = (tri_ref, rect_ref, disk_ref, sph_ref)
        if use_sobol or use_hash:
            # per-lane sample-index / pixel-id planes precede the outputs
            si_ref = out_refs.pop(0)
            pix_ref = out_refs.pop(0)
        pid = pl.program_id(0)
        tile_seed = seed_ref[0] + pid * np.int32(2654435761 & 0x7fffffff)
        if use_sobol:
            rng = wf._Rng(tile_seed, False,
                          sobol=(si_ref[:],
                                 wf._pix_hash(pix_ref[:], seed_ref[0])))
        elif use_hash:
            # mesh-invariant stateless streams (see wavefront._Rng)
            lane_seed = wf._pix_hash(si_ref[:],
                                     wf._pix_hash(pix_ref[:], seed_ref[0]))
            rng = wf._Rng(lane_seed, False, per_lane=True)
        else:
            if hw_rng:
                pltpu.prng_seed(tile_seed)
            rng = wf._Rng(tile_seed, hw_rng)

        if grad:
            # (gx gy gz flx fly flz) inputs precede the outputs
            (gx_ref, gy_ref, gz_ref, flx_ref, fly_ref, flz_ref,
             dout_ref, rows_ref, *acc_refs) = out_refs
            dta_ref = acc_refs.pop(0) if tex_recs else None
            dtb_ref = acc_refs.pop(0) if tex_recs else None
            dti_ref = acc_refs.pop(0) if img_recs else None
            g = V3(gx_ref[:], gy_ref[:], gz_ref[:])
            r_tail = V3(flx_ref[:], fly_ref[:], flz_ref[:])
            dplanes = []          # stacked in output order
            row_planes = []       # per-bounce sid+1 int32 planes
            acc_env = None
            acc_le = [None] * L   # per-light d light_emit
            if tex_recs:
                # textures are FEW even at scene scale: per-texture V3
                # accumulators live in-kernel exactly as in the baked
                # kernel (wavefront.py grad mode); their planes are
                # summed across the grid into shared (0,0,0) out blocks
                acc_ta = [v3_zeros(gx_ref[:]) for _ in range(n_tex)]
                acc_tb = [v3_zeros(gx_ref[:]) for _ in range(n_tex)]
            if img_recs:
                acc_ti = [v3_zeros(gx_ref[:]) for _ in range(n_texels)]
        elif residual:
            lx_ref, ly_ref, lz_ref, resf_ref, resi_ref = out_refs
            res_ix, res_n = _bigres_layout(cfg, L, env_i is not None,
                                           bool(img_recs))
            res_planes = [None] * res_n
            res_ints = [None] * (cfg.max_depth + 1)
        else:
            lx_ref, ly_ref, lz_ref = out_refs

        o = V3(ox_ref[:], oy_ref[:], oz_ref[:])
        d = V3(dx_ref[:], dy_ref[:], dz_ref[:])
        shp = o.x.shape
        beta = v3_full(o.x, 1.0, 1.0, 1.0)
        big_l = v3_zeros(o.x)
        alive = jnp.zeros(shp, jnp.float32) < 1.0
        spec_prev = jnp.zeros(shp, jnp.int32)
        pdf_prev = jnp.ones(shp, jnp.float32)
        phits_prev = None   # wavefront._light_sample phit carry

        def v3add(a, b):
            return b if a is None else a + b

        for bounce in range(cfg.max_depth + 1):
            # whole-tile dead skip: path death is spatially clustered
            # (sky/miss regions of the film die together) and lanes are
            # pixel-ordered, so whole tiles go dead early — skip their
            # sweeps entirely (alive fractions measured on random_spheres:
            # 0.64/0.23/0.13/0.08 at bounces 0-3)
            # the cone cull only pays for itself on COHERENT rays; after
            # bounce 0 directions are hemispherical (obtuse cones test
            # every block and the 129 scalar tests are pure overhead —
            # measured net-negative), so cull only the primary sweep
            b_bounds = bounds if bounce == 0 else None
            if use_mxu:
                def closest(_, o=o, d=d):
                    return _closest_hit_tables_mxu(refs, counts, o, d)
            else:
                def closest(_, o=o, d=d, b_bounds=b_bounds):
                    return _closest_hit_tables(refs, counts, o, d,
                                               bounds=b_bounds)
            if bounce == 0:
                cy = closest(None)
            else:
                any_alive = jnp.max(jnp.where(alive, np.float32(1.0),
                                              np.float32(0.0))) > 0.0
                cy = jax.lax.cond(
                    any_alive, closest,
                    lambda _: _Carry.init(o.x.shape), None)
            (t, nx, ny, nz, difx, dify, difz, spcx, spcy, spcz,
             emix, emiy, emiz, kindf, expo, eta, sprob, dprob, lixf,
             rowf) = cy
            valid = jnp.isfinite(t) & (t < np.float32(np.inf))
            nrm = V3(nx, ny, nz)
            t_safe = jnp.where(valid, t, 1.0)
            hp = o + d * t_safe
            wo = -d

            facing = nrm.dot(wo) > 0.0
            emit_mask = valid & facing
            le = V3(jnp.where(emit_mask, emix, 0.0),
                    jnp.where(emit_mask, emiy, 0.0),
                    jnp.where(emit_mask, emiz, 0.0))

            if bounce == 0:
                full = True
            elif has_delta:
                full = spec_prev != 0
            else:
                full = False
            if full is True:
                w_emit = jnp.ones(shp, jnp.float32)
            else:
                li_idx = lixf.astype(jnp.int32)
                if phits_prev is not None:
                    pdf_l_hit = jnp.zeros(shp, jnp.float32)
                    for i in range(L):
                        pdf_l_hit = jnp.where(li_idx == i, phits_prev[i],
                                              pdf_l_hit)
                else:
                    pdf_l_hit = wf._hit_light_pdf(lights, li_idx, o, d,
                                                  t_safe, nrm)
                w_emit = jnp.where(full, np.float32(1.0),
                                   wf._safe_div(pdf_prev,
                                                pdf_prev + pdf_l_hit))
            wb = jnp.where(alive, w_emit, 0.0)
            e_term = le * wb
            big_l = big_l + beta * e_term
            if grad:
                # d emission[row] of the hit-emission term
                wbm = jnp.where(emit_mask, wb, 0.0)
                de_b = g * beta * wbm
            elif residual:
                res_planes[res_ix[("wb", bounce)]] = \
                    jnp.where(emit_mask, wb, 0.0)
                for c, v in enumerate((emix, emiy, emiz)):
                    res_planes[res_ix[("emi", bounce, c)]] = v

            if env_i is not None:
                env = V3(env_ref[0, 0] * jnp.ones(shp, jnp.float32),
                         env_ref[0, 1] * jnp.ones(shp, jnp.float32),
                         env_ref[0, 2] * jnp.ones(shp, jnp.float32))
                if full is True:
                    w_env = np.float32(1.0)
                else:
                    pdf_env = wf._light_pdf(lights[env_i], o, nrm, d)
                    w_env = jnp.where(full, np.float32(1.0),
                                      wf._safe_div(pdf_prev,
                                                   pdf_prev + pdf_env))
                wenv = jnp.where(alive & ~valid, w_env, 0.0)
                e_term = e_term + env * wenv
                big_l = big_l + beta * env * wenv
                if grad:
                    acc_env = v3add(acc_env, g * beta * wenv)
                elif residual:
                    res_planes[res_ix[("wenv", bounce)]] = wenv

            if grad:
                row_planes.append((rowf.astype(jnp.int32) + np.int32(1))
                                  * valid.astype(jnp.int32))
            if bounce == cfg.max_depth:
                if grad:
                    dplanes.extend([de_b.x, de_b.y, de_b.z])
                if residual:
                    res_ints[bounce] = \
                        (rowf.astype(jnp.int32) + np.int32(1)) \
                        * valid.astype(jnp.int32)
                continue
            cont = alive & valid

            # material resolution from the carried columns
            diffuse = V3(difx, dify, difz)
            if tex_recs:
                # textured rows are FEW even in big scenes: the baked
                # kernel's static per-rec machinery (wavefront.py:873-996)
                # applies unchanged, selected by the carried global row.
                # Parity masks / bilinear taps are kept for the adjoint
                # routing (grad) and the coefficient cache (residual).
                sid_i = rowf.astype(jnp.int32)
                tex_par = [None if rec.get("kind") == "image"
                           else wf._checker_parity(static, rec, hp)
                           for rec in tex_recs]
                tex_xy = [wf._image_uv_xy(static, rec, hp)
                          if rec.get("kind") == "image" else None
                          for rec in tex_recs]
                tex_ws = [None if xy is None else wf._image_texel_weights(
                              rec, *wf._image_taps_from_xy(rec, *xy))
                          for rec, xy in zip(tex_recs, tex_xy)]
                diffuse = wf._apply_textures(
                    static, texa_ref, texb_ref, timg_ref,
                    sid_i, hp, diffuse, tex_par, tex_ws)
            specular = V3(spcx, spcy, spcz)
            is_matte = kindf == np.float32(kbsdf.MAT_MATTE)
            is_mirror = kindf == np.float32(kbsdf.MAT_MIRROR)
            is_glass = kindf == np.float32(kbsdf.MAT_GLASS)
            is_plastic = kindf == np.float32(kbsdf.MAT_PLASTIC)
            if has_plastic:
                u_lobe = rng.uniform(shp)
                pick_spec = u_lobe < sprob
                plastic_kind = jnp.where(pick_spec, np.int32(kbsdf.PHONG),
                                         np.int32(kbsdf.LAMBERT))
                inv_sp = 1.0 / jnp.maximum(sprob, 1e-12)
                inv_dp = 1.0 / jnp.maximum(dprob, 1e-12)
                plastic_col = (specular * inv_sp).where(pick_spec,
                                                        diffuse * inv_dp)
                lobe_is_phong = is_plastic & pick_spec
                lobe_scale = jnp.where(is_plastic,
                                       jnp.where(pick_spec, inv_sp, inv_dp),
                                       1.0)
            else:
                plastic_kind = np.int32(kbsdf.LAMBERT)
                plastic_col = diffuse
                lobe_is_phong = is_plastic & (t < -1.0)  # statically false
                lobe_scale = np.float32(1.0)
            kind = jnp.where(is_matte, np.int32(kbsdf.LAMBERT),
                             jnp.where(is_mirror, np.int32(kbsdf.MIRROR),
                                       jnp.where(is_glass,
                                                 np.int32(kbsdf.GLASS),
                                                 plastic_kind)))
            color = diffuse.where(is_matte,
                                  specular.where(is_mirror | is_glass,
                                                 plastic_col))
            color2 = diffuse
            if has_delta:
                delta = is_mirror | is_glass
                nee_act = cont & ~delta
            else:
                nee_act = cont

            s_f, t_f, n_f = make_frame(nrm)
            wo_l = to_local(s_f, t_f, n_f, wo)
            # world-space mirror direction for the per-light NEE eval
            # (wavefront._bsdf_eval_pdf_dots; one build per bounce)
            wr_w = (nrm * (wo_l.z * 2.0) - wo) \
                if kbsdf.PHONG in eval_lobes else None
            col_nee_tbl = specular.where(lobe_is_phong, diffuse) \
                if has_plastic else diffuse

            # ---- NEE: sample all lights, merged occlusion, accumulate ----
            u1, u2 = rng.uniform2(shp)
            azim = None
            if any(lt["kind"] in (klights.AREA_SPHERE, klights.ENV)
                   for lt in lights):
                cphi_s = jnp.cos(np.float32(km.TWO_PI) * u2)
                azim = (cphi_s, wf._sin_from_phi_cos(cphi_s, u2))
            smps = [wf._light_sample(lt, world_radius, hp, nrm, u1, u2,
                                     azim) for lt in lights]
            nds = [nrm.dot(smp[0]) for smp in smps]
            if all(smp[4] is not None for smp in smps):
                phits_prev = [smp[4] for smp in smps]
            # whole-tile NEE skip mirrors the closest-hit one: if no lane
            # in this tile does NEE at this bounce, the occlusion sweep
            # never runs (bool results cross the cond as int32 planes —
            # Mosaic cannot materialize bool vectors)
            any_nee = jnp.max(jnp.where(nee_act, np.float32(1.0),
                                        np.float32(0.0))) > 0.0

            # cull="cone+nee" (opt-in): shadow rays toward COMPACT
            # lights (sphere/rect/point) converge on the light, so their
            # sweep is block-culled at EVERY depth, in a separate group
            # from unbounded lights (env/direction — arbitrary directions
            # at 2*world_radius would widen the union cone to pass every
            # block). MEASURED (2026-08-20, v5e, 1026 surfaces depth 3):
            # pays only when lanes are spatially binned — unbinned
            # camera-order tiles have screen-wide hp clouds past bounce 0,
            # so the cones stay fat and the ~129 per-block lax.cond tests
            # are pure overhead (5.44 -> 4.79 M rays/s). Default "cone"
            # keeps the round-3 behavior: one merged sweep, culled at the
            # primary bounce only.
            if use_mxu:
                def occ_sweep(_):
                    hs = _any_hit_tables_mxu(
                        refs, counts, hp, nrm,
                        [(smp[0], smp[3] - km.SHADOW_EPSILON)
                         for smp in smps],
                        robust=(cfg.shadow == "robust"), own=own_geo,
                        nd=nds)
                    return tuple(jnp.where(h, np.int32(1), np.int32(0))
                                 for h in hs)
            elif cfg.cull == "cone+nee":
                compact_i = [i for i, lt in enumerate(lights)
                             if lt["kind"] not in (klights.ENV,
                                                   klights.DIRECTION)]
                wide_i = [i for i in range(L) if i not in compact_i]

                def occ_sweep(_):
                    rays_all = [(smp[0], smp[3] - km.SHADOW_EPSILON)
                                for smp in smps]
                    hs = [None] * L

                    def group(idxs, grp_bounds):
                        if not idxs:
                            return
                        sub = _any_hit_tables(
                            refs, counts, hp, nrm,
                            [rays_all[i] for i in idxs],
                            robust=(cfg.shadow == "robust"),
                            own=([own_geo[i] for i in idxs]
                                 if own_geo is not None else None),
                            bounds=grp_bounds, nd=[nds[i] for i in idxs])
                        for j, i in enumerate(idxs):
                            hs[i] = sub[j]

                    group(compact_i, bounds if use_cull else None)
                    group(wide_i, None)
                    return tuple(jnp.where(h, np.int32(1), np.int32(0))
                                 for h in hs)
            else:
                def occ_sweep(_):
                    hs = _any_hit_tables(
                        refs, counts, hp, nrm,
                        [(smp[0], smp[3] - km.SHADOW_EPSILON)
                         for smp in smps],
                        robust=(cfg.shadow == "robust"), own=own_geo,
                        bounds=b_bounds, nd=nds)
                    return tuple(jnp.where(h, np.int32(1), np.int32(0))
                                 for h in hs)

            occs_i = jax.lax.cond(
                any_nee, occ_sweep,
                lambda _: tuple(jnp.zeros(shp, jnp.int32)
                                for _ in lights), None)
            occs = [h != 0 for h in occs_i]
            ld = v3_zeros(o.x)
            nee_base = nee_act & ~color.is_black()
            if grad:
                # bounce-local color adjoints (every term of this bounce
                # attaches to the SAME carried hit row)
                addc_diff = v3_zeros(o.x)
                addc_spec = v3_zeros(o.x)
                addx = jnp.zeros(shp, jnp.float32) if use_texp else None
                gb = g * beta
            for i, lt in enumerate(lights):
                emit_l = V3(light_emit_ref[i, 0], light_emit_ref[i, 1],
                            light_emit_ref[i, 2])
                wi, pdf_l, li_s, dist, _phit = smps[i]
                cos_aw = wr_w.dot(wi) if wr_w is not None \
                    else jnp.zeros(shp, jnp.float32)
                pdf_b, f_unit_e = wf._bsdf_eval_pdf_dots(
                    kind, expo, wo_l.z, nds[i], cos_aw, eval_lobes, None)
                ucos = f_unit_e * jnp.abs(nds[i])
                if lt["kind"] in (klights.POINT, klights.DIRECTION):
                    w = wf._safe_div(np.float32(1.0), pdf_l)
                else:
                    w = wf._safe_div(np.float32(1.0), pdf_l + pdf_b)
                ok = nee_base & (pdf_l > 0.0) & (li_s != 0.0) \
                    & (ucos != 0.0)
                okf = jnp.where(ok & ~occs[i], w, 0.0)
                bp = li_s * ucos * okf * lobe_scale
                ld = ld + col_nee_tbl * emit_l * bp
                if residual:
                    res_planes[res_ix[("B", bounce, i)]] = bp
                    if use_texp:
                        res_planes[res_ix[("Bk", bounce, i)]] = jnp.where(
                            lobe_is_phong,
                            bp * wf._kappa_dot(expo, cos_aw), 0.0)
                if grad:
                    # d light emission (linear in Li; routed to the light's
                    # emitting surface row / env leaf by the caller)
                    acc_le[i] = v3add(acc_le[i], gb * col_nee_tbl * bp)
                    # d material color (linear in eval): target by lobe
                    addc = gb * emit_l * bp
                    if has_plastic:
                        addc_spec = addc_spec + V3(
                            jnp.where(lobe_is_phong, addc.x, 0.0),
                            jnp.where(lobe_is_phong, addc.y, 0.0),
                            jnp.where(lobe_is_phong, addc.z, 0.0))
                        addc_diff = addc_diff + V3(
                            jnp.where(lobe_is_phong, 0.0, addc.x),
                            jnp.where(lobe_is_phong, 0.0, addc.y),
                            jnp.where(lobe_is_phong, 0.0, addc.z))
                    else:
                        addc_diff = addc_diff + addc
                    if use_texp:
                        # d f_unit/d e at the FIXED light-sampled wi
                        # (wavefront._kappa; same detached-pdf convention
                        # as wavefront.py's trainable-exponent replay)
                        kap = wf._kappa_dot(expo, cos_aw)
                        dsum = (addc.x * col_nee_tbl.x
                                + addc.y * col_nee_tbl.y
                                + addc.z * col_nee_tbl.z)
                        addx = addx + jnp.where(lobe_is_phong, dsum * kap,
                                                0.0)
            big_l = big_l + beta * ld
            if grad:
                e_term = e_term + ld

            # ---- extension sample ----
            u1, u2 = rng.uniform2(shp)
            f_s, wi_l, pdf_s, delta_s, f_unit_s, glass_refract = \
                wf._bsdf_sample(kind, color, color2, eta, expo, wo_l,
                                u1, u2, lobes, None)
            wi_w = to_world(s_f, t_f, n_f, wi_l)
            ok = cont & ~f_s.is_black() & (pdf_s != 0.0)
            thr = f_s * wf._safe_div(jnp.abs(wi_l.z), pdf_s)
            beta_new = beta * thr
            # kill f32-overflow lanes (see wavefront._make_kernel)
            ok = ok & (beta_new.max_component() < np.float32(np.inf))
            if bounce > cfg.rr_start:
                u_rr = rng.uniform(shp)
                q = jnp.maximum(np.float32(0.05),
                                1.0 - beta_new.max_component())
                kill = u_rr < q
                scale = wf._safe_div(np.float32(1.0), 1.0 - q)
                beta_new = beta_new * scale
                alive_n = ok & ~kill
            else:
                scale = np.float32(1.0)
                alive_n = ok

            if residual:
                t_unit = f_unit_s * wf._safe_div(jnp.abs(wi_l.z),
                                                 pdf_s) * scale
                tu_plane = jnp.where(alive_n, t_unit * lobe_scale, 0.0)
                res_planes[res_ix[("tu", bounce)]] = tu_plane
                if use_texp:
                    res_planes[res_ix[("tuk", bounce)]] = jnp.where(
                        lobe_is_phong,
                        tu_plane * wf._kappa(expo, wo_l, wi_l), 0.0)
                for c, v in enumerate((diffuse.x, diffuse.y,
                                       diffuse.z)):
                    res_planes[res_ix[("dif", bounce, c)]] = v
                for c, v in enumerate((spcx, spcy, spcz)):
                    res_planes[res_ix[("spc", bounce, c)]] = v
                if has_delta or has_plastic:
                    to_spec_res = (is_mirror | (is_glass & ~glass_refract)
                                   | lobe_is_phong)
                else:
                    to_spec_res = valid & ~valid   # statically false
                packed = (
                    (rowf.astype(jnp.int32) + np.int32(1))
                    * valid.astype(jnp.int32)
                    + lobe_is_phong.astype(jnp.int32) * np.int32(1 << 20)
                    + to_spec_res.astype(jnp.int32) * np.int32(1 << 21))
                if tex_recs:
                    # a lane's row matches at most one texture rec, so one
                    # combined checker-even bit suffices (wavefront's
                    # res_ints bit-10 convention, here bit 22)
                    tex_even = jnp.zeros(shp, jnp.int32)
                    for ti, rec in enumerate(tex_recs):
                        if tex_par[ti] is None:
                            continue
                        onrow = sid_i == np.int32(rec["row"])
                        tex_even = jnp.where(onrow & tex_par[ti],
                                             np.int32(1), tex_even)
                    packed = packed + tex_even * np.int32(1 << 22)
                res_ints[bounce] = packed
                if img_recs:
                    # continuous texel coords of the hit on its image row
                    # (bilinear taps are a pure function of these)
                    tx_pl = jnp.zeros(shp, jnp.float32)
                    ty_pl = jnp.zeros(shp, jnp.float32)
                    for ti, rec in enumerate(tex_recs):
                        if tex_xy[ti] is None:
                            continue
                        onrow = sid_i == np.int32(rec["row"])
                        tx_pl = jnp.where(onrow, tex_xy[ti][0], tx_pl)
                        ty_pl = jnp.where(onrow, tex_xy[ti][1], ty_pl)
                    res_planes[res_ix[("tx", bounce)]] = tx_pl
                    res_planes[res_ix[("ty", bounce)]] = ty_pl

            if grad:
                # tail radiance for the NEXT vertex:
                # R_{b+1} = (R_b - E_b) / T_b, 0 where the path ends
                t_eff = thr * scale
                t_x = jnp.where(alive_n, t_eff.x, 0.0)
                t_y = jnp.where(alive_n, t_eff.y, 0.0)
                t_z = jnp.where(alive_n, t_eff.z, 0.0)
                r_next = V3(wf._safe_div(r_tail.x - e_term.x, t_x),
                            wf._safe_div(r_tail.y - e_term.y, t_y),
                            wf._safe_div(r_tail.z - e_term.z, t_z))
                r_next = V3(jnp.where(alive_n, r_next.x, 0.0),
                            jnp.where(alive_n, r_next.y, 0.0),
                            jnp.where(alive_n, r_next.z, 0.0))
                # throughput adjoint: T = base_color * lobe_scale * t_unit
                t_unit = f_unit_s * wf._safe_div(jnp.abs(wi_l.z),
                                                 pdf_s) * scale
                coeff_t = jnp.where(alive_n, t_unit * lobe_scale, 0.0)
                addt = g * beta * r_next * coeff_t
                if has_delta or has_plastic:
                    to_spec_t = (is_mirror | (is_glass & ~glass_refract)
                                 | lobe_is_phong)
                    addc_spec = addc_spec + V3(
                        jnp.where(to_spec_t, addt.x, 0.0),
                        jnp.where(to_spec_t, addt.y, 0.0),
                        jnp.where(to_spec_t, addt.z, 0.0))
                    addc_diff = addc_diff + V3(
                        jnp.where(to_spec_t, 0.0, addt.x),
                        jnp.where(to_spec_t, 0.0, addt.y),
                        jnp.where(to_spec_t, 0.0, addt.z))
                else:
                    addc_diff = addc_diff + addt
                if use_texp:
                    # phong extension throughput: dT/de = T * kappa at the
                    # fixed sampled wi (pdf detached — a replayed number)
                    kap_s = wf._kappa(expo, wo_l, wi_l)
                    dsum_t = (addt.x * col_nee_tbl.x
                              + addt.y * col_nee_tbl.y
                              + addt.z * col_nee_tbl.z)
                    addx = addx + jnp.where(lobe_is_phong, dsum_t * kap_s,
                                            0.0)
                if tex_recs:
                    # the diffuse VALUE on textured rows came from the
                    # texture, so its adjoint routes to the texture leaves
                    # (by cell parity / bilinear tap weight — wavefront's
                    # replay routing, wavefront.py:2195-2225) and the
                    # row-tagged diffuse share is zeroed
                    for ti, rec in enumerate(tex_recs):
                        onrow = sid_i == np.int32(rec["row"])
                        if rec.get("kind") == "image":
                            base = rec["img"] * rec["th"] * rec["tw"]
                            for k, wk in enumerate(tex_ws[ti]):
                                wk = jnp.where(onrow, wk, 0.0)
                                tt = base + k
                                acc_ti[tt] = V3(
                                    acc_ti[tt].x + addc_diff.x * wk,
                                    acc_ti[tt].y + addc_diff.y * wk,
                                    acc_ti[tt].z + addc_diff.z * wk)
                        else:
                            even = tex_par[ti]
                            tt = rec["tex"]
                            sel_a = onrow & even
                            sel_b = onrow & ~even
                            acc_ta[tt] = V3(
                                acc_ta[tt].x
                                + jnp.where(sel_a, addc_diff.x, 0.0),
                                acc_ta[tt].y
                                + jnp.where(sel_a, addc_diff.y, 0.0),
                                acc_ta[tt].z
                                + jnp.where(sel_a, addc_diff.z, 0.0))
                            acc_tb[tt] = V3(
                                acc_tb[tt].x
                                + jnp.where(sel_b, addc_diff.x, 0.0),
                                acc_tb[tt].y
                                + jnp.where(sel_b, addc_diff.y, 0.0),
                                acc_tb[tt].z
                                + jnp.where(sel_b, addc_diff.z, 0.0))
                        addc_diff = V3(
                            jnp.where(onrow, 0.0, addc_diff.x),
                            jnp.where(onrow, 0.0, addc_diff.y),
                            jnp.where(onrow, 0.0, addc_diff.z))
                dplanes.extend([addc_diff.x, addc_diff.y, addc_diff.z,
                                addc_spec.x, addc_spec.y, addc_spec.z,
                                de_b.x, de_b.y, de_b.z]
                               + ([addx] if use_texp else []))
                r_tail = r_next

            o = wf._offset_origin(hp, nrm, wi_w).where(alive_n, o)
            d = wi_w.where(alive_n, d)
            beta = beta_new.where(alive_n, beta)
            if has_delta:
                spec_prev = jnp.where(alive_n, delta_s.astype(jnp.int32),
                                      spec_prev)
            pdf_prev = jnp.where(alive_n, pdf_s, pdf_prev)
            alive = alive_n

        if grad:
            zero = jnp.zeros(shp, jnp.float32)
            env_v = acc_env if acc_env is not None else v3_zeros(zero)
            dplanes.extend([env_v.x, env_v.y, env_v.z])
            for i in range(L):
                le_v = acc_le[i] if acc_le[i] is not None else v3_zeros(zero)
                dplanes.extend([le_v.x, le_v.y, le_v.z])
            dout_ref[:] = jnp.stack(dplanes, axis=0)
            rows_ref[:] = jnp.stack(row_planes, axis=0)
            if tex_recs:
                def stack_acc(acc):
                    planes = []
                    for v in acc:
                        planes.extend([v.x, v.y, v.z])
                    return jnp.stack(planes, axis=0)

                arr_ta = stack_acc(acc_ta)
                arr_tb = stack_acc(acc_tb)
                arr_ti = stack_acc(acc_ti) if img_recs else None

                @pl.when(pid == 0)
                def _():
                    dta_ref[:] = arr_ta
                    dtb_ref[:] = arr_tb
                    if img_recs:
                        dti_ref[:] = arr_ti

                @pl.when(pid != 0)
                def _():
                    dta_ref[:] = dta_ref[:] + arr_ta
                    dtb_ref[:] = dtb_ref[:] + arr_tb
                    if img_recs:
                        dti_ref[:] = dti_ref[:] + arr_ti
        else:
            lx_ref[:] = big_l.x
            ly_ref[:] = big_l.y
            lz_ref[:] = big_l.z
            if residual:
                assert all(pp is not None for pp in res_planes), \
                    [t for t, k in res_ix.items() if res_planes[k] is None]
                resf_ref[:] = jnp.stack(res_planes, axis=0)
                resi_ref[:] = jnp.stack(res_ints, axis=0)

    return kernel


def _make_res_bwd_kernel(static, cfg: wf.KernelConfig, L: int,
                         has_env: bool):
    """Coefficient-cache backward for the table kernel: NO geometry
    sweeps, NO RNG — pure algebra over the _bigres_layout planes (the
    bigscene analog of wavefront's residual backward, wavefront.py:2296,
    emitting row-tagged adjoint planes instead of per-row accumulators).
    Walks bounces FORWARD carrying (beta, tail radiance); every adjoint
    term is bilinear in (cached coefficient, cached color, light emit).
    Textured rows route the diffuse-value adjoint to the texture leaves
    (checker parity from res_ints bit 22; bilinear taps rebuilt from the
    cached "tx"/"ty" planes with pure floor/mask/FMA) and zero the
    row-tagged diffuse share — wavefront's residual-texture convention."""
    use_texp = cfg.trainable_exponent
    tex_recs = static.get("textures", [])
    img_recs = [r for r in tex_recs if r.get("kind") == "image"]
    n_tex = static.get("n_textures", 0)
    n_texels = static.get("n_texels", 0)
    res_ix, res_n = _bigres_layout(cfg, L, has_env, bool(img_recs))
    B = cfg.max_depth

    def kernel(light_emit_ref, env_ref, gx_ref, gy_ref, gz_ref,
               flx_ref, fly_ref, flz_ref, resf_ref, resi_ref, dout_ref,
               *acc_refs):
        acc_refs = list(acc_refs)
        dta_ref = acc_refs.pop(0) if tex_recs else None
        dtb_ref = acc_refs.pop(0) if tex_recs else None
        dti_ref = acc_refs.pop(0) if img_recs else None
        g = V3(gx_ref[:], gy_ref[:], gz_ref[:])
        r_tail = V3(flx_ref[:], fly_ref[:], flz_ref[:])
        shp = g.x.shape
        beta = v3_full(g.x, 1.0, 1.0, 1.0)
        dplanes = []
        acc_env = v3_zeros(g.x)
        acc_le = [v3_zeros(g.x) for _ in range(L)]
        if tex_recs:
            acc_ta = [v3_zeros(g.x) for _ in range(n_tex)]
            acc_tb = [v3_zeros(g.x) for _ in range(n_tex)]
        if img_recs:
            acc_ti = [v3_zeros(g.x) for _ in range(n_texels)]

        def rf(tag):
            return resf_ref[res_ix[tag]]

        for bounce in range(B + 1):
            ib = resi_ref[bounce]
            wb = rf(("wb", bounce))
            emi = V3(rf(("emi", bounce, 0)), rf(("emi", bounce, 1)),
                     rf(("emi", bounce, 2)))
            gb = g * beta
            de_b = gb * wb
            e_term = emi * wb
            if has_env:
                wenv = rf(("wenv", bounce))
                env = V3(env_ref[0, 0], env_ref[0, 1], env_ref[0, 2])
                e_term = e_term + env * wenv
                acc_env = acc_env + gb * wenv
            if bounce == B:
                dplanes.extend([de_b.x, de_b.y, de_b.z])
                continue

            phong = (ib & np.int32(1 << 20)) != 0
            spec_t = (ib & np.int32(1 << 21)) != 0
            dif = V3(rf(("dif", bounce, 0)), rf(("dif", bounce, 1)),
                     rf(("dif", bounce, 2)))
            spc = V3(rf(("spc", bounce, 0)), rf(("spc", bounce, 1)),
                     rf(("spc", bounce, 2)))
            col_nee = spc.where(phong, dif)
            addc_diff = v3_zeros(g.x)
            addc_spec = v3_zeros(g.x)
            addx = jnp.zeros(shp, jnp.float32) if use_texp else None
            for i in range(L):
                bp = rf(("B", bounce, i))
                emit_l = V3(light_emit_ref[i, 0], light_emit_ref[i, 1],
                            light_emit_ref[i, 2])
                e_term = e_term + col_nee * emit_l * bp
                acc_le[i] = acc_le[i] + gb * col_nee * bp
                addc = gb * emit_l * bp
                addc_spec = addc_spec + V3(
                    jnp.where(phong, addc.x, 0.0),
                    jnp.where(phong, addc.y, 0.0),
                    jnp.where(phong, addc.z, 0.0))
                addc_diff = addc_diff + V3(
                    jnp.where(phong, 0.0, addc.x),
                    jnp.where(phong, 0.0, addc.y),
                    jnp.where(phong, 0.0, addc.z))
                if use_texp:
                    bk = rf(("Bk", bounce, i))
                    addx = addx + (gb.x * emit_l.x * col_nee.x
                                   + gb.y * emit_l.y * col_nee.y
                                   + gb.z * emit_l.z * col_nee.z) * bk

            # extension: T_b = ext color (x) tu; peel the tail radiance
            tu = rf(("tu", bounce))
            ext_tbl = spc.where(spec_t, dif)
            t_eff = ext_tbl * tu
            r_next = V3(wf._safe_div(r_tail.x - e_term.x, t_eff.x),
                        wf._safe_div(r_tail.y - e_term.y, t_eff.y),
                        wf._safe_div(r_tail.z - e_term.z, t_eff.z))
            addt = gb * r_next * tu
            addc_spec = addc_spec + V3(jnp.where(spec_t, addt.x, 0.0),
                                       jnp.where(spec_t, addt.y, 0.0),
                                       jnp.where(spec_t, addt.z, 0.0))
            addc_diff = addc_diff + V3(jnp.where(spec_t, 0.0, addt.x),
                                       jnp.where(spec_t, 0.0, addt.y),
                                       jnp.where(spec_t, 0.0, addt.z))
            if use_texp:
                # tuk is pre-masked to phong lanes, whose raw extension
                # color is the specular table
                tuk = rf(("tuk", bounce))
                addx = addx + (gb.x * r_next.x * spc.x
                               + gb.y * r_next.y * spc.y
                               + gb.z * r_next.z * spc.z) * tuk
            if tex_recs:
                row1 = ib & np.int32((1 << 20) - 1)
                even = (ib & np.int32(1 << 22)) != 0
                if img_recs:
                    tx = rf(("tx", bounce))
                    ty = rf(("ty", bounce))
                for rec in tex_recs:
                    onrow = row1 == np.int32(rec["row"] + 1)
                    if rec.get("kind") == "image":
                        idx, wts = wf._image_taps_from_xy(rec, tx, ty)
                        tws = wf._image_texel_weights(rec, idx, wts)
                        base = rec["img"] * rec["th"] * rec["tw"]
                        for k, wk in enumerate(tws):
                            wk = jnp.where(onrow, wk, 0.0)
                            tt = base + k
                            acc_ti[tt] = V3(
                                acc_ti[tt].x + addc_diff.x * wk,
                                acc_ti[tt].y + addc_diff.y * wk,
                                acc_ti[tt].z + addc_diff.z * wk)
                    else:
                        tt = rec["tex"]
                        sel_a = onrow & even
                        sel_b = onrow & ~even
                        acc_ta[tt] = V3(
                            acc_ta[tt].x
                            + jnp.where(sel_a, addc_diff.x, 0.0),
                            acc_ta[tt].y
                            + jnp.where(sel_a, addc_diff.y, 0.0),
                            acc_ta[tt].z
                            + jnp.where(sel_a, addc_diff.z, 0.0))
                        acc_tb[tt] = V3(
                            acc_tb[tt].x
                            + jnp.where(sel_b, addc_diff.x, 0.0),
                            acc_tb[tt].y
                            + jnp.where(sel_b, addc_diff.y, 0.0),
                            acc_tb[tt].z
                            + jnp.where(sel_b, addc_diff.z, 0.0))
                    addc_diff = V3(jnp.where(onrow, 0.0, addc_diff.x),
                                   jnp.where(onrow, 0.0, addc_diff.y),
                                   jnp.where(onrow, 0.0, addc_diff.z))
            dplanes.extend([addc_diff.x, addc_diff.y, addc_diff.z,
                            addc_spec.x, addc_spec.y, addc_spec.z,
                            de_b.x, de_b.y, de_b.z]
                           + ([addx] if use_texp else []))
            beta = beta * t_eff
            r_tail = r_next

        dplanes.extend([acc_env.x, acc_env.y, acc_env.z])
        for i in range(L):
            dplanes.extend([acc_le[i].x, acc_le[i].y, acc_le[i].z])
        dout_ref[:] = jnp.stack(dplanes, axis=0)
        if tex_recs:
            def stack_acc(acc):
                planes = []
                for v in acc:
                    planes.extend([v.x, v.y, v.z])
                return jnp.stack(planes, axis=0)

            pid = pl.program_id(0)
            arr_ta = stack_acc(acc_ta)
            arr_tb = stack_acc(acc_tb)
            arr_ti = stack_acc(acc_ti) if img_recs else None

            @pl.when(pid == 0)
            def _():
                dta_ref[:] = arr_ta
                dtb_ref[:] = arr_tb
                if img_recs:
                    dti_ref[:] = arr_ti

            @pl.when(pid != 0)
            def _():
                dta_ref[:] = dta_ref[:] + arr_ta
                dtb_ref[:] = dtb_ref[:] + arr_tb
                if img_recs:
                    dti_ref[:] = dti_ref[:] + arr_ti

    return kernel


_TRACER_MEMO: dict = {}


def make_bigscene_tracer(scene, cfg: wf.KernelConfig | None = None,
                         interpret: bool = False, _hash_rng: bool = False):
    """Jitted lane tracer over the geometry tables.

    Returns fn(scene, o, d, seed) -> (N, 3) radiance. Geometry columns are
    host constants of the table arrays; the material columns are traced
    (gathered from scene.mat_* per call), so parameter updates reuse the
    compile. One Mosaic compile per (geometry digest, cfg) — compile time
    is O(1) in the surface count (fori_loop sweeps).

    With cfg.sampler == "sobol" the signature gains two (N,) int32 lane
    arrays — fn(scene, o, d, seed, sample_index, pixel_id) — with the same
    fixed-seed / advancing-sample-index accumulation convention as the
    baked kernel (wavefront.make_pallas_tracer)."""
    cfg = cfg or wf.KernelConfig()
    if cfg.sampler not in ("random", "sobol", "hash"):
        raise NotImplementedError(
            "bigscene kernel: sampler must be 'random', 'sobol' or 'hash'")
    if interpret == "generic":
        # callback-free interpreter (see wavefront.make_pallas_tracer):
        # required for sharded train steps on CPU meshes
        interpret = True
    elif interpret is True:
        interpret = pltpu.InterpretParams()
    static, tables = extract_tables(scene)
    memo_key = ("big", wf._static_digest(static), cfg, repr(interpret),
                _hash_rng)
    cached = _TRACER_MEMO.get(memo_key)
    if cached is not None:
        return cached
    counts = {k: tables[k][0].shape[0] for k in tables}
    hw = interpret is False and not _hash_rng
    kernel = _make_kernel(static, counts, cfg, hw_rng=hw)
    n_lights = int(scene.n_lights)
    has_env = bool(scene.has_env)
    geo_np = {k: tables[k][0] for k in tables}
    rows_np = {k: tables[k][1] for k in tables}
    bounds_np = {k: tables[k][2] for k in tables}
    use_cull = cfg.cull != "off"
    tex_recs = static.get("textures", [])
    has_img = any(r.get("kind") == "image" for r in tex_recs)
    n_texels = static.get("n_texels", 0)
    t_rows = scene.textures.n_textures if tex_recs else 0
    geo_cols = {"tri": PLANAR_GEO_COLS, "rect": PLANAR_GEO_COLS,
                "disk": DISK_GEO_COLS, "sphere": SPHERE_GEO_COLS}
    total_bytes = sum(
        g.shape[0] * (g.shape[1] + MAT_COLS) * 4 for g in geo_np.values())
    table_space = pltpu.SMEM if total_bytes <= SMEM_TABLE_LIMIT \
        else pltpu.VMEM
    use_sobol = cfg.sampler in ("sobol", "hash")  # kernel takes si/pix

    @jax.jit
    def trace(scene, o, d, seed, si=None, pix=None):
        n = o.shape[0]
        tile = cfg.rows * LANE
        npad = ((n + tile - 1) // tile) * tile
        grid = npad // tile

        def planes(v):
            pad = jnp.zeros((npad - n,), jnp.float32)
            return [jnp.concatenate([v[:, i], pad])
                    .reshape(grid * cfg.rows, LANE) for i in range(3)]

        def iplane(v):
            pad = jnp.zeros((npad - n,), jnp.int32)
            return jnp.concatenate([v.astype(jnp.int32), pad]) \
                .reshape(grid * cfg.rows, LANE)

        extra = [iplane(si), iplane(pix)] if use_sobol else []
        ox, oy, oz = planes(o)
        dx, dy, dz = planes(d)
        tabs = []
        for k in ("tri", "rect", "disk", "sphere"):
            g = jnp.asarray(geo_np[k])
            m = _mat_cols(scene, rows_np[k])
            tabs.append(jnp.concatenate([g, m], axis=-1) if g.shape[0]
                        else jnp.zeros((UNROLL, geo_cols[k] + MAT_COLS),
                                       jnp.float32))
        bnds = [jnp.asarray(bounds_np[k])
                for k in ("tri", "rect", "disk", "sphere")
                if counts[k]] if use_cull else []
        tex_in = ([scene.textures.color_a, scene.textures.color_b]
                  if tex_recs else [])
        if has_img:
            tex_in.append(scene.textures.image.reshape(-1, 3))

        blk = pl.BlockSpec((cfg.rows, LANE), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        smem = functools.partial(pl.BlockSpec, index_map=lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)
        tab_spec = [pl.BlockSpec(memory_space=table_space) for _ in tabs]
        tex_spec = ([smem((t_rows, 3)), smem((t_rows, 3))]
                    if tex_recs else []) \
            + ([smem((n_texels, 3))] if has_img else [])
        bnd_spec = [pl.BlockSpec(memory_space=pltpu.SMEM) for _ in bnds]
        seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
        light_emit = (scene.lights.emit if n_lights
                      else jnp.zeros((1, 3), jnp.float32))
        env = (scene.env_radiance_ if has_env
               else jnp.zeros(3, jnp.float32)).reshape(1, 3)
        out = pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + tab_spec
            + tex_spec + bnd_spec
            + [smem((max(n_lights, 1), 3)), smem((1, 3)),
               blk, blk, blk, blk, blk, blk] + [blk] * len(extra),
            out_specs=[blk, blk, blk],
            out_shape=[jax.ShapeDtypeStruct((grid * cfg.rows, LANE),
                                            jnp.float32) for _ in range(3)],
            interpret=interpret,
        )(seed_arr, *tabs, *tex_in, *bnds, light_emit, env,
          ox, oy, oz, dx, dy, dz, *extra)
        lx, ly, lz = [v.reshape(-1)[:n] for v in out]
        return jnp.stack([lx, ly, lz], axis=-1)

    _TRACER_MEMO[memo_key] = trace
    return trace


def make_bigscene_diff_tracer(scene, cfg: wf.KernelConfig | None = None,
                              interpret: bool = False,
                              _hash_rng: bool = False,
                              backward: str = "residual"):
    """Differentiable table-kernel tracer.

    backward="residual" (default): the forward caches the per-bounce
    transport coefficients (_bigres_layout) and the backward is pure
    cache algebra — no geometry sweeps at all (the 2x the baked kernel
    measured for its own residual mode). backward="replay" re-traces the
    transport on the same RNG stream (no cache memory traffic).

    Returns fn(diffuse, specular, emission, env, o, d, seed) -> (N, 3)
    radiance with a custom VJP producing (d_diffuse, d_specular,
    d_emission, d_env) — detached-sampling gradients identical in
    semantics to wavefront.make_pallas_diff_tracer(backward="replay"),
    but scaled to thousands of surfaces: the backward kernel writes
    per-bounce per-lane adjoint contributions tagged with the hit row and
    the host graph segment-sums them into the (M, 3) tables (one one-hot
    matmul per backward — per-row VMEM accumulators would need
    3*M*rows*LANE*4 bytes and die past ~100 rows). NEE light-emission
    adjoints are routed to each light's emitting surface row exactly as
    diff.params.set_params ties them.

    With cfg.sampler == "sobol" the returned fn takes two extra (N,) int32
    arrays (sample_index, pixel_id) after `seed`; they are
    nondifferentiable and must be identical between forward and backward
    (the replay backward re-draws the same Owen-Sobol stream from them)."""
    cfg = cfg or wf.KernelConfig()
    if cfg.sampler not in ("random", "sobol", "hash"):
        raise NotImplementedError(
            "bigscene kernel: sampler must be 'random', 'sobol' or 'hash'")
    if interpret == "generic":
        interpret = True   # callback-free; see wavefront.make_pallas_tracer
    elif interpret is True:
        interpret = pltpu.InterpretParams()
    static, tables = extract_tables(scene)
    if backward not in ("replay", "residual"):
        raise ValueError(f"backward must be replay|residual: {backward!r}")
    memo_key = ("bigdiff", wf._static_digest(static), cfg, repr(interpret),
                _hash_rng, backward)
    cached = _TRACER_MEMO.get(memo_key)
    if cached is not None:
        return cached
    counts = {k: tables[k][0].shape[0] for k in tables}
    hw = interpret is False and not _hash_rng
    residual = backward == "residual"
    L = len(static["lights"])
    res_env = any(lt["kind"] == klights.ENV for lt in static["lights"])
    tex_recs = static.get("textures", [])
    has_tex = bool(tex_recs)
    has_img = any(r.get("kind") == "image" for r in tex_recs)
    t_rows = static.get("n_textures", 0) if has_tex else 0
    n_texels = static.get("n_texels", 0) if has_img else 0
    img_shape = tuple(scene.textures.image.shape) if has_img else (0, 3)
    fwd_kernel = _make_kernel(static, counts, cfg, hw_rng=hw,
                              residual=residual)
    if residual:
        bwd_kernel = _make_res_bwd_kernel(static, cfg, L, res_env)
        res_ix, res_n = _bigres_layout(cfg, L, res_env, has_img)
    else:
        bwd_kernel = _make_kernel(static, counts, cfg, hw_rng=hw,
                                  grad=True)
    n_lights = int(scene.n_lights)
    m_rows = int(scene.mat_kind.shape[0])
    geo_np = {k: tables[k][0] for k in tables}
    rows_np = {k: tables[k][1] for k in tables}
    bounds_np = {k: tables[k][2] for k in tables}
    use_cull = cfg.cull != "off"
    geo_cols = {"tri": PLANAR_GEO_COLS, "rect": PLANAR_GEO_COLS,
                "disk": DISK_GEO_COLS, "sphere": SPHERE_GEO_COLS}
    total_bytes = sum(
        g.shape[0] * (g.shape[1] + MAT_COLS) * 4 for g in geo_np.values())
    table_space = pltpu.SMEM if total_bytes <= SMEM_TABLE_LIMIT \
        else pltpu.VMEM
    B = cfg.max_depth            # bounces with extension terms
    use_texp = cfg.trainable_exponent
    PB = 10 if use_texp else 9   # per-bounce planes (dd ds de [dx])
    P = PB * B + 6 + 3 * L       # dout planes (see _make_kernel grad doc)
    light_rows = [int(v) for v in np.asarray(scene.lights.surface_ids)] \
        if n_lights else []
    light_kinds = [int(v) for v in np.asarray(scene.lights.kinds)] \
        if n_lights else []
    lights_emit_const = (np.asarray(scene.lights.emit) if n_lights
                         else np.zeros((1, 3), np.float32))

    def _light_emit_of(emission, env):
        if not n_lights:
            return jnp.zeros((1, 3), jnp.float32)
        rows = jnp.asarray([max(r, 0) for r in light_rows], jnp.int32)
        has = jnp.asarray([r >= 0 for r in light_rows])[:, None]
        emit = jnp.where(has, emission[rows],
                         jnp.asarray(lights_emit_const))
        for i, k in enumerate(light_kinds):
            if k == klights.ENV:
                emit = emit.at[i].set(env)
        return emit

    def _tabs(diffuse, specular, emission, exponent):
        tabs = []
        for k in ("tri", "rect", "disk", "sphere"):
            g = jnp.asarray(geo_np[k])
            m = _mat_cols(scene, rows_np[k], diffuse, specular, emission,
                          exponent)
            tabs.append(jnp.concatenate([g, m], axis=-1) if g.shape[0]
                        else jnp.zeros((UNROLL, geo_cols[k] + MAT_COLS),
                                       jnp.float32))
        return tabs

    bnds = [jnp.asarray(bounds_np[k])
            for k in ("tri", "rect", "disk", "sphere")
            if counts[k]] if use_cull else []
    bnd_spec = [pl.BlockSpec(memory_space=pltpu.SMEM) for _ in bnds]

    def _grid_of(n):
        tile = cfg.rows * LANE
        npad = ((n + tile - 1) // tile) * tile
        return npad, npad // tile

    use_sobol = cfg.sampler in ("sobol", "hash")  # kernel takes si/pix

    def _planes(v, n, npad, rows):
        pad = jnp.zeros((npad - n,), jnp.float32)
        return [jnp.concatenate([v[:, i], pad]).reshape(rows, LANE)
                for i in range(3)]

    def _iplanes(si, pix, n, npad, rows):
        if not use_sobol:
            return []
        pad = jnp.zeros((npad - n,), jnp.int32)
        return [jnp.concatenate([v.astype(jnp.int32), pad])
                .reshape(rows, LANE) for v in (si, pix)]

    def _specs(grid):
        blk = pl.BlockSpec((cfg.rows, LANE), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        smem = functools.partial(pl.BlockSpec, index_map=lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)
        tab_spec = [pl.BlockSpec(memory_space=table_space)
                    for _ in range(4)]
        return blk, smem, tab_spec

    def _tex_args(texa, texb, timg):
        """(pallas inputs, in_specs) for the texture tables — placed right
        after the geometry tables (the kernel pops them first)."""
        if not has_tex:
            return [], []
        smem_t = functools.partial(pl.BlockSpec,
                                   index_map=lambda i: (0, 0),
                                   memory_space=pltpu.SMEM)
        inputs = [texa, texb]
        specs = [smem_t((t_rows, 3)), smem_t((t_rows, 3))]
        if has_img:
            inputs.append(timg.reshape(-1, 3))
            specs.append(smem_t((n_texels, 3)))
        return inputs, specs

    def _acc_blk(nplanes):
        return pl.BlockSpec((nplanes, cfg.rows, LANE),
                            lambda i: (0, 0, 0), memory_space=pltpu.VMEM)

    def _acc_shape(nplanes):
        return jax.ShapeDtypeStruct((nplanes, cfg.rows, LANE), jnp.float32)

    acc_extra_specs = ([_acc_blk(3 * t_rows), _acc_blk(3 * t_rows)]
                       if has_tex else []) \
        + ([_acc_blk(3 * n_texels)] if has_img else [])
    acc_extra_shapes = ([_acc_shape(3 * t_rows), _acc_shape(3 * t_rows)]
                        if has_tex else []) \
        + ([_acc_shape(3 * n_texels)] if has_img else [])

    @jax.custom_vjp
    def trace(diffuse, specular, emission, exponent, texa, texb, timg,
              env, o, d, seed, si=None, pix=None):
        return _fwd_impl(diffuse, specular, emission, exponent, texa,
                         texb, timg, env, o, d, seed, si, pix)

    def _stk_spec(nplanes):
        return pl.BlockSpec((nplanes, cfg.rows, LANE),
                            lambda i: (0, i, 0), memory_space=pltpu.VMEM)

    def _fwd_impl(diffuse, specular, emission, exponent, texa, texb,
                  timg, env, o, d, seed, si, pix, want_res=False):
        n = o.shape[0]
        npad, grid = _grid_of(n)
        rows = grid * cfg.rows
        blk, smem, tab_spec = _specs(grid)
        ox, oy, oz = _planes(o, n, npad, rows)
        dx, dy, dz = _planes(d, n, npad, rows)
        extra = _iplanes(si, pix, n, npad, rows)
        tex_in, tex_spec = _tex_args(texa, texb, timg)
        res_specs, res_shapes = [], []
        if residual:
            res_specs = [_stk_spec(res_n), _stk_spec(cfg.max_depth + 1)]
            res_shapes = [
                jax.ShapeDtypeStruct((res_n, rows, LANE), jnp.float32),
                jax.ShapeDtypeStruct((cfg.max_depth + 1, rows, LANE),
                                     jnp.int32)]
        out = pl.pallas_call(
            fwd_kernel, grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + tab_spec
            + tex_spec + bnd_spec
            + [smem((max(n_lights, 1), 3)), smem((1, 3)),
               blk, blk, blk, blk, blk, blk] + [blk] * len(extra),
            out_specs=[blk, blk, blk] + res_specs,
            out_shape=[jax.ShapeDtypeStruct((rows, LANE), jnp.float32)
                       for _ in range(3)] + res_shapes,
            interpret=interpret,
        )(jnp.asarray(seed, jnp.int32).reshape(1),
          *_tabs(diffuse, specular, emission, exponent), *tex_in, *bnds,
          _light_emit_of(emission, env), env.reshape(1, 3),
          ox, oy, oz, dx, dy, dz, *extra)
        lx, ly, lz = [v.reshape(-1)[:n] for v in out[:3]]
        big_l = jnp.stack([lx, ly, lz], axis=-1)
        if want_res:
            return big_l, out[3], out[4]
        return big_l

    def _fwd(diffuse, specular, emission, exponent, texa, texb, timg,
             env, o, d, seed, si=None, pix=None):
        if residual:
            big_l, resf, resi = _fwd_impl(
                diffuse, specular, emission, exponent, texa, texb, timg,
                env, o, d, seed, si, pix, want_res=True)
            return big_l, (diffuse, specular, emission, exponent, texa,
                           texb, timg, env, o, d, seed, si, pix, big_l,
                           resf, resi)
        big_l = _fwd_impl(diffuse, specular, emission, exponent, texa,
                          texb, timg, env, o, d, seed, si, pix)
        return big_l, (diffuse, specular, emission, exponent, texa, texb,
                       timg, env, o, d, seed, si, pix, big_l, None, None)

    def _bwd(res, g):
        (diffuse, specular, emission, exponent, texa, texb, timg, env, o,
         d, seed, si, pix, big_l, resf, resi) = res
        n = o.shape[0]
        npad, grid = _grid_of(n)
        rows = grid * cfg.rows
        blk, smem, tab_spec = _specs(grid)
        gx, gy, gz = _planes(g, n, npad, rows)
        flx, fly, flz = _planes(big_l, n, npad, rows)
        dta = dtb = dti = None

        def _unpack_acc(outs):
            nonlocal dta, dtb, dti
            if has_tex:
                dta = outs.pop(0).sum(axis=(1, 2)).reshape(t_rows, 3)
                dtb = outs.pop(0).sum(axis=(1, 2)).reshape(t_rows, 3)
            if has_img:
                dti = outs.pop(0).sum(axis=(1, 2)).reshape(img_shape)

        def stk(nplanes):
            return pl.BlockSpec((nplanes, cfg.rows, LANE),
                                lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)

        if residual:
            # cache-algebra backward: no geometry, no RNG, no sweeps
            outs = pl.pallas_call(
                bwd_kernel, grid=(grid,),
                in_specs=[smem((max(n_lights, 1), 3)), smem((1, 3)),
                          blk, blk, blk, blk, blk, blk,
                          stk(res_n), stk(B + 1)],
                out_specs=[stk(P)] + acc_extra_specs,
                out_shape=[jax.ShapeDtypeStruct((P, rows, LANE),
                                                jnp.float32)]
                + acc_extra_shapes,
                interpret=interpret,
            )(_light_emit_of(emission, env), env.reshape(1, 3),
              gx, gy, gz, flx, fly, flz, resf, resi)
            outs = list(outs) if isinstance(outs, (list, tuple)) \
                else [outs]
            dout = outs.pop(0)
            _unpack_acc(outs)
            dout = dout.reshape(P, -1)[:, :n]
            sid1 = (resi.reshape(B + 1, -1)[:, :n]
                    & np.int32((1 << 20) - 1))
        else:
            ox, oy, oz = _planes(o, n, npad, rows)
            dx, dy, dz = _planes(d, n, npad, rows)
            extra = _iplanes(si, pix, n, npad, rows)
            tex_in, tex_spec = _tex_args(texa, texb, timg)
            outs = pl.pallas_call(
                bwd_kernel, grid=(grid,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + tab_spec
                + tex_spec + bnd_spec
                + [smem((max(n_lights, 1), 3)), smem((1, 3)),
                   blk, blk, blk, blk, blk, blk] + [blk] * len(extra)
                + [blk, blk, blk, blk, blk, blk],
                out_specs=[stk(P), stk(B + 1)] + acc_extra_specs,
                out_shape=[jax.ShapeDtypeStruct((P, rows, LANE),
                                                jnp.float32),
                           jax.ShapeDtypeStruct((B + 1, rows, LANE),
                                                jnp.int32)]
                + acc_extra_shapes,
                interpret=interpret,
            )(jnp.asarray(seed, jnp.int32).reshape(1),
              *_tabs(diffuse, specular, emission, exponent), *tex_in,
              *bnds,
              _light_emit_of(emission, env), env.reshape(1, 3),
              ox, oy, oz, dx, dy, dz, *extra, gx, gy, gz, flx, fly, flz)
            outs = list(outs)
            dout = outs.pop(0)
            rows_out = outs.pop(0)
            _unpack_acc(outs)
            dout = dout.reshape(P, -1)[:, :n]           # (P, n)
            sid1 = rows_out.reshape(B + 1, -1)[:, :n]   # (B+1, n)

        # per-bounce PB-column contribution rows -> segment-sum by sid+1
        data = [dout[PB * b:PB * b + PB].T for b in range(B)]
        horizon = jnp.concatenate(
            [jnp.zeros((n, 6), jnp.float32), dout[PB * B:PB * B + 3].T]
            + ([jnp.zeros((n, 1), jnp.float32)] if use_texp else []),
            axis=-1)
        data.append(horizon)
        flat = jnp.concatenate(data, axis=0)              # ((B+1)*n, PB)
        ids = sid1.reshape(-1)
        seg = jax.ops.segment_sum(flat, ids, num_segments=m_rows + 1)[1:]
        dd, ds, de = seg[:, 0:3], seg[:, 3:6], seg[:, 6:9]
        dxp = seg[:, 9] if use_texp else None
        denv = dout[PB * B + 3:PB * B + 6].sum(axis=-1)
        for i in range(L):
            dle = dout[PB * B + 6 + 3 * i:PB * B + 9 + 3 * i].sum(axis=-1)
            r = light_rows[i] if i < len(light_rows) else -1
            if r >= 0:
                de = de.at[r].add(dle)
            elif i < len(light_kinds) and light_kinds[i] == klights.ENV:
                denv = denv + dle
        dxp = dxp if use_texp else jnp.zeros_like(exponent)
        if dta is None:
            dta = jnp.zeros((t_rows, 3), jnp.float32)
            dtb = jnp.zeros((t_rows, 3), jnp.float32)
        if dti is None:
            dti = jnp.zeros(img_shape, jnp.float32)
        return (dd, ds, de, dxp, dta, dtb, dti, denv,
                None, None, None, None, None)

    trace.defvjp(_fwd, _bwd)
    # public positional order mirrors wavefront.make_pallas_diff_tracer:
    # diffuse, specular, emission, [exponent if trainable_exponent],
    # [texa, texb if textured], [timg if image-textured], env, o, d,
    # seed, [si, pix if sobol]
    exp_const = jnp.asarray(scene.mat_exponent)
    tex_a0 = scene.textures.color_a if has_tex \
        else jnp.zeros((0, 3), jnp.float32)
    tex_b0 = scene.textures.color_b if has_tex \
        else jnp.zeros((0, 3), jnp.float32)
    timg0 = scene.textures.image if has_img \
        else jnp.zeros((0, 3), jnp.float32)

    def public(diffuse, specular, emission, *rest):
        rest = list(rest)
        exponent = rest.pop(0) if use_texp else exp_const
        texa = rest.pop(0) if has_tex else tex_a0
        texb = rest.pop(0) if has_tex else tex_b0
        timg = rest.pop(0) if has_img else timg0
        env, o, d, seed = rest[:4]
        si, pix = (rest[4], rest[5]) if len(rest) > 4 else (None, None)
        return trace(diffuse, specular, emission, exponent, texa, texb,
                     timg, env, o, d, seed, si, pix)

    _TRACER_MEMO[memo_key] = public
    return public


def render_bigscene(scene, spp: int = 16, seed: int = 1234,
                    cfg: wf.KernelConfig | None = None, clamp: bool = True,
                    rays_per_pass: int = 1 << 22, interpret: bool = False):
    """Full-frame render through the table-driven kernel -> (H, W, 3)."""
    from kytpu.kernels.wavefront import render_pallas

    tracer = make_bigscene_tracer(scene, cfg, interpret)
    return render_pallas(scene, spp=spp, seed=seed, cfg=cfg, clamp=clamp,
                         rays_per_pass=rays_per_pass, interpret=interpret,
                         tracer=tracer)
