"""Hybrid wavefront engine for LARGE scenes: Pallas geometry sweeps +
XLA transport + alive-compaction between bounces.

The table-driven megakernel (kernels/bigscene.py) keeps the whole bounce
loop in VMEM — unbeatable when most lanes stay alive, but at scene scale
it has two structural costs this engine removes:

  1. DEAD LANES: it sweeps every surface for every lane at every bounce.
     On builders.random_spheres (sky environment), the alive fraction is
     0.64 / 0.23 / 0.13 / 0.08 at bounces 0-3 (measured 2026-08-20) — the
     megakernel pays full price for all of them. Here, lanes are
     stably PARTITIONED alive-first between bounces (cumsum + one
     scatter + gathers, all XLA; no dynamic shapes), and the sweep
     kernels skip whole dead tiles with one `pl.when`.
  2. CARRY WEIGHT: its closest-hit sweep carries 20 winner planes
     (material columns) through the row loop. Here the sweep carries
     only (t, row) — 2 planes — and the winner's surface binding happens
     ONCE per lane in XLA (per-lane `take` gathers, ~3.7 ms per 1M x 20
     on v5e, measured), exactly like the jnp engine's gather-at-hit
     (kytpu/scene/scene.py:163-190).

Transport (emission MIS, NEE, extension sampling, RR) is the production
single-sample-MIS estimator of kytpu.integrator.fast — the same XLA code
path, same RNG discipline (per-lane keys travel with the lanes through
the partition, so the result is bitwise independent of lane order) — with
the two geometry primitives (closest-hit, any-hit) served by lean Pallas
table-sweep kernels that reuse kernels/bigscene.py's row tests, Morton-
sorted tables, and per-block cone cull.

Role in the reference: this is the accelerator the reference stubs at
ky.cpp:3104 plus the CUDA-megakernel replacement (smallpt2pbrt/
smallpt_kernel.cpp), re-architected for the TPU: the VPU sweeps rows,
the host graph does the per-lane gathers/compaction XLA is good at.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kytpu.core import math as km
from kytpu.kernels import bigscene as bs
from kytpu.kernels import wavefront as wf
from kytpu.kernels.v3 import V3

LANE = 128

_SWEEP_MEMO = {}


def _pad_planes(v, n, npad, rows):
    pad = jnp.zeros((npad - n,), v.dtype)
    return jnp.concatenate([v, pad]).reshape(rows, LANE)


# binding-table columns (packed-row order; ONE per-lane gather binds the
# whole hit — normal source, emission, light id, material; scene.py:163-190
# semantics)
B_NX, B_NY, B_NZ = 0, 1, 2        # planar normal | sphere center
B_FLAG = 3                        # 0 planar fixed | 1 rect (flip) | 2 sphere
B_EMIX, B_EMIY, B_EMIZ = 4, 5, 6
B_LIX = 7
B_KIND = 8
B_DIFX, B_DIFY, B_DIFZ = 9, 10, 11
B_SPCX, B_SPCY, B_SPCZ = 12, 13, 14
B_EXP, B_ETA, B_DPROB, B_SPROB = 15, 16, 17, 18
B_SID = 19
BIND_COLS = 20


def make_sweeps(scene, cfg: wf.KernelConfig | None = None,
                interpret: bool = False):
    """Build (closest, any_hit, bind_np) for a table-eligible scene.

    Returns (closest, any_hit, bind_np, own_row).
    closest(o, d, alive) -> (t, packed_row): packed_row indexes the
    CONCATENATED padded table space (tri | rect | disk | sphere); misses
    get -1.  bind_np: host (total+1, BIND_COLS) float32 binding table in
    packed-row order (last row = all-zero miss sentinel) — materials are
    BAKED, so this engine renders but does not differentiate scene
    parameters (use the bigscene diff tracer for training).
    any_hit(o, d, tmax, alive, skip) -> bool mask, same gates as
    kytpu.scene.shapes.any_hit (origins already offset by the caller);
    `skip` is a per-lane packed-row float (-1 = none) excluded from the
    sweep — the robust shadow mode's own-light-geometry skip
    (fast.py skip_row / bigscene own_geo semantics).
    own_row: {light_index: packed row of that light's own geometry}.
    """
    cfg = cfg or wf.KernelConfig()
    if interpret is True:
        interpret = pltpu.InterpretParams()
    static, tables = bs.extract_tables(scene)
    if static.get("textures"):
        raise NotImplementedError(
            "hybrid engine: textures are baked nowhere in the binding "
            "table — use the table kernel / jnp engines for textured "
            "scenes")
    memo_key = ("hybrid", wf._static_digest(static), cfg.rows, cfg.cull,
                repr(interpret))
    cached = _SWEEP_MEMO.get(memo_key)
    if cached is not None:
        return cached
    counts = {k: tables[k][0].shape[0] for k in tables}
    geo_np = {k: tables[k][0] for k in tables}
    bounds_np = {k: tables[k][2] for k in tables}
    use_cull = cfg.cull != "off"
    order = ("tri", "rect", "disk", "sphere")
    bases = {}
    total = 0
    for k in order:
        bases[k] = total
        total += counts[k]
    # packed row -> global surface row (padding rows never win: their
    # geometry is all-zero => t = 0/0 = nan, rejected by every gate)
    sid_map = np.zeros(total + 1, np.int32)
    for k in order:
        sid_map[bases[k]:bases[k] + counts[k]] = tables[k][1]

    host = jax.device_get(scene)
    g = host.geometry
    n_planar = int(g.n_planar)
    bind_np = np.zeros((total + 1, BIND_COLS), np.float32)
    own_row = {}
    # REAL (pre-padding) entry count per class — counts[k] is the padded
    # table height; padding rows must keep all-zero bindings (their
    # geometry never wins) and must not index g.sp_center.
    n_real = {k: 0 for k in order}
    for kname, _ti in static["table_of_row"].values():
        n_real[kname] += 1
    from kytpu.scene import shapes as kshapes
    for k in order:
        b0 = bases[k]
        rows = np.asarray(tables[k][1])[:n_real[k]]
        for ti, row in enumerate(rows):
            r = bind_np[b0 + ti]
            if k == "sphere":
                j = int(row) - n_planar
                r[B_NX:B_NZ + 1] = np.asarray(g.sp_center)[j]
                r[B_FLAG] = 2.0
            else:
                r[B_NX:B_NZ + 1] = np.asarray(g.pl_normal)[int(row)]
                r[B_FLAG] = 1.0 if int(np.asarray(g.pl_kind)[int(row)]) \
                    == kshapes.RECT else 0.0
            r[B_EMIX:B_EMIZ + 1] = np.asarray(host.emission)[int(row)]
            li = int(np.asarray(host.light_index)[int(row)])
            if li >= 0 and li not in own_row:
                own_row[li] = b0 + ti
            r[B_LIX] = float(np.asarray(host.light_index)[int(row)])
            r[B_KIND] = float(np.asarray(host.mat_kind)[int(row)])
            r[B_DIFX:B_DIFZ + 1] = np.asarray(host.mat_diffuse)[int(row)]
            r[B_SPCX:B_SPCZ + 1] = np.asarray(host.mat_specular)[int(row)]
            r[B_EXP] = float(np.asarray(host.mat_exponent)[int(row)])
            r[B_ETA] = float(np.asarray(host.mat_eta)[int(row)])
            r[B_DPROB] = float(np.asarray(host.mat_d_prob)[int(row)])
            r[B_SPROB] = float(np.asarray(host.mat_s_prob)[int(row)])
            r[B_SID] = float(row)
    bind_np[total, B_LIX] = -1.0
    # padded to UNROLL so the in-kernel resolve loop can run block-wise
    bind_pad = bs._pad_rows(bind_np)
    bind_rows = bind_pad.shape[0]

    tabs = [jnp.asarray(geo_np[k]) if counts[k]
            else jnp.zeros((bs.UNROLL, 1), jnp.float32) for k in order]
    bnds = [jnp.asarray(bounds_np[k]) for k in order if counts[k]] \
        if use_cull else []
    bind_j = jnp.asarray(bind_pad)

    def _sweep_kernel(mode: str):
        """mode='closest' | 'any'."""

        def kernel(*refs):
            refs = list(refs)
            tab_refs = [refs.pop(0) for _ in range(4)]
            if use_cull:
                bref = {k: (refs.pop(0) if counts[k] else None)
                        for k in order}
            else:
                bref = {k: None for k in order}
            if mode == "closest":
                bind_ref = refs.pop(0)
                (ox, oy, oz, dx, dy, dz, alive_ref, out_ref) = refs
            else:
                (ox, oy, oz, dx, dy, dz, tm_ref, skip_ref, alive_ref,
                 h_ref) = refs
            o = V3(ox[:], oy[:], oz[:])
            d = V3(dx[:], dy[:], dz[:])
            if mode == "closest":
                out_ref[0] = jnp.full_like(out_ref[0], np.float32(np.inf))
                for c in range(1, 1 + BIND_COLS):
                    out_ref[c] = jnp.zeros_like(out_ref[c])
            else:
                h_ref[:] = jnp.zeros_like(h_ref[:])

            @pl.when(jnp.max(alive_ref[:]) > 0.0)
            def _():
                preds = {k: None for k in order}
                if use_cull:
                    if mode == "closest":
                        cone = bs._ray_cone(o, d)
                        tmax_s = None
                    else:
                        cone = bs._ray_cone(o, d)
                        tmax_s = jnp.max(jnp.where(
                            jnp.isnan(tm_ref[:]), np.float32(np.inf),
                            tm_ref[:]))
                    for k in order:
                        if bref[k] is not None:
                            preds[k] = (
                                lambda i, b=bref[k]: bs._cone_hits_block(
                                    cone, b, i, tmax=tmax_s))

                eps = km.SHAPE_EPSILON
                if mode == "closest":
                    carry = (jnp.full(o.x.shape, np.float32(np.inf)),
                             jnp.full(o.x.shape, np.float32(-1.0)))

                    def select(cy, accept, t, base, s):
                        tb, rb = cy
                        rowf = (base + s).astype(jnp.float32)
                        return (jnp.where(accept, t, tb),
                                jnp.where(accept, rowf, rb))

                    def planar_body(tri, ref, base):
                        def body(s, cy):
                            t, inside, _ = bs._planar_row_test(
                                ref, s, o, d, tri)
                            accept = inside & (t > eps) & (t < cy[0])
                            return select(cy, accept, t, base, s)
                        return body

                    def disk_body(s, cy):
                        t, inside, _ = bs._disk_row_test(
                            tab_refs[2], s, o, d)
                        accept = inside & (t > eps) & (t < cy[0])
                        return select(cy, accept, t, bases["disk"], s)

                    def sph_body(s, cy):
                        c, r, cc, neg_b, discr = bs._sphere_row_parts(
                            tab_refs[3], s, o, d)
                        sq = wf._safe_sqrt(discr)
                        sgn = jnp.where(neg_b >= 0.0, np.float32(1.0),
                                        np.float32(-1.0))
                        q = neg_b + sgn * sq
                        tq = cc / q
                        t1 = jnp.minimum(q, tq)
                        t2 = jnp.maximum(q, tq)
                        t1_ok = t1 > eps
                        t = jnp.where(t1_ok, t1, t2)
                        accept = (discr >= 0) & (r > 0) \
                            & (t1_ok | (t2 > eps)) & (t < cy[0])
                        return select(cy, accept, t, bases["sphere"], s)

                    carry = bs._fori_culled(
                        counts["tri"],
                        planar_body(True, tab_refs[0], bases["tri"]),
                        carry, preds["tri"])
                    carry = bs._fori_culled(
                        counts["rect"],
                        planar_body(False, tab_refs[1], bases["rect"]),
                        carry, preds["rect"])
                    carry = bs._fori_culled(counts["disk"], disk_body,
                                            carry, preds["disk"])
                    carry = bs._fori_culled(counts["sphere"], sph_body,
                                            carry, preds["sphere"])
                    tb, rb = carry
                    out_ref[0] = tb

                    # ---- in-kernel binding resolve over the DYNAMIC
                    # winner-row range. A per-lane XLA gather of the
                    # binding table costs ~27 ms per 1M lanes on v5e
                    # (TPU gathers are element-serial); here the cost
                    # scales with the tile's winner SPREAD — small for
                    # coherent tiles (Morton-sorted tables), bounded by
                    # one select sweep for incoherent ones, zero for
                    # dead tiles. ----
                    n_blk = bind_rows // bs.UNROLL
                    # all-miss sentinel must stay int32-representable:
                    # a wrapping f32->i32 conversion of 3e9 would spin
                    # the loop for ~2^31 iterations on all-miss tiles
                    miss = np.float32(bind_rows)
                    lo = jnp.min(jnp.where(rb < 0.0, miss, rb))
                    hi = jnp.max(rb)
                    lo_b = jnp.clip(lo, 0.0, miss) \
                        .astype(jnp.int32) // bs.UNROLL
                    lo_b = jnp.minimum(lo_b, np.int32(n_blk))
                    hi_b = jnp.clip((hi.astype(jnp.int32) // bs.UNROLL)
                                    + 1, 0, n_blk)

                    def bind_blk(i, acc):
                        for k in range(bs.UNROLL):
                            s = i * bs.UNROLL + k
                            m = rb == s.astype(jnp.float32)
                            acc = tuple(
                                jnp.where(m, bind_ref[s, c], acc[c])
                                for c in range(BIND_COLS))
                        return acc

                    acc = tuple(jnp.zeros(o.x.shape, jnp.float32)
                                for _ in range(BIND_COLS))
                    acc = jax.lax.fori_loop(lo_b, hi_b, bind_blk, acc)
                    for c in range(BIND_COLS):
                        out_ref[1 + c] = acc[c]
                else:
                    tmax = tm_ref[:]
                    skip = skip_ref[:]
                    one = np.float32(1.0)

                    def acc(h, hit_row):
                        return jnp.where(hit_row, one, h)

                    def not_skip(base, s):
                        return (base + s).astype(jnp.float32) != skip

                    def planar_body(tri, ref, base):
                        def body(s, h):
                            t, inside, _ = bs._planar_row_test(
                                ref, s, o, d, tri)
                            return acc(h, inside & (t > eps) & (t < tmax)
                                       & not_skip(base, s))
                        return body

                    def disk_body(s, h):
                        t, inside, _ = bs._disk_row_test(
                            tab_refs[2], s, o, d)
                        return acc(h, inside & (t > eps) & (t < tmax)
                                   & not_skip(bases["disk"], s))

                    def sph_body(s, h):
                        c, r, cc, neg_b, discr = bs._sphere_row_parts(
                            tab_refs[3], s, o, d)
                        sq = wf._safe_sqrt(discr)
                        sgn = jnp.where(neg_b >= 0.0, np.float32(1.0),
                                        np.float32(-1.0))
                        q = neg_b + sgn * sq
                        tq = cc / q
                        t1 = jnp.minimum(q, tq)
                        t2 = jnp.maximum(q, tq)
                        in1 = (t1 > eps) & (t1 < tmax)
                        in2 = (t2 > eps) & (t2 < tmax)
                        return acc(h, (discr >= 0) & (r > 0) & (in1 | in2)
                                   & not_skip(bases["sphere"], s))

                    h = jnp.zeros(o.x.shape, jnp.float32)
                    h = bs._fori_culled(counts["tri"],
                                        planar_body(True, tab_refs[0],
                                                    bases["tri"]),
                                        h, preds["tri"])
                    h = bs._fori_culled(counts["rect"],
                                        planar_body(False, tab_refs[1],
                                                    bases["rect"]),
                                        h, preds["rect"])
                    h = bs._fori_culled(counts["disk"], disk_body, h,
                                        preds["disk"])
                    h = bs._fori_culled(counts["sphere"], sph_body, h,
                                        preds["sphere"])
                    h_ref[:] = h

        return kernel

    closest_kernel = _sweep_kernel("closest")
    any_kernel = _sweep_kernel("any")
    table_space = pltpu.SMEM if sum(
        g.shape[0] * g.shape[1] * 4 for g in geo_np.values()) \
        <= bs.SMEM_TABLE_LIMIT else pltpu.VMEM

    tile = cfg.rows * LANE

    def _specs(n):
        npad = ((n + tile - 1) // tile) * tile
        grid = npad // tile
        rows = grid * cfg.rows
        blk = pl.BlockSpec((cfg.rows, LANE), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        tab_spec = [pl.BlockSpec(memory_space=table_space)
                    for _ in range(4)]
        bnd_spec = [pl.BlockSpec(memory_space=pltpu.SMEM) for _ in bnds]
        return npad, grid, rows, blk, tab_spec, bnd_spec

    @jax.jit
    def closest(o, d, alive):
        """(t, bind): t (N,) — inf on miss; bind (N, BIND_COLS) winner
        binding columns (zeros on miss), resolved in-kernel."""
        n = o.shape[0]
        npad, grid, rows, blk, tab_spec, bnd_spec = _specs(n)
        args = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                alive.astype(jnp.float32)]
        planes = [_pad_planes(a, n, npad, rows) for a in args]
        stk = pl.BlockSpec((1 + BIND_COLS, cfg.rows, LANE),
                           lambda i: (0, i, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            closest_kernel, grid=(grid,),
            in_specs=tab_spec + bnd_spec
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] + [blk] * 7,
            out_specs=stk,
            out_shape=jax.ShapeDtypeStruct((1 + BIND_COLS, rows, LANE),
                                           jnp.float32),
            interpret=interpret,
        )(*tabs, *bnds, bind_j, *planes)
        flat = out.reshape(1 + BIND_COLS, -1)[:, :n]
        return flat[0], flat[1:].T

    @jax.jit
    def any_hit(o, d, tmax, alive, skip):
        n = o.shape[0]
        npad, grid, rows, blk, tab_spec, bnd_spec = _specs(n)
        args = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                tmax, skip, alive.astype(jnp.float32)]
        planes = [_pad_planes(a, n, npad, rows) for a in args]
        out = pl.pallas_call(
            any_kernel, grid=(grid,),
            in_specs=tab_spec + bnd_spec + [blk] * 9,
            out_specs=blk,
            out_shape=jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            interpret=interpret,
        )(*tabs, *bnds, *planes)
        return out.reshape(-1)[:n] > 0.0

    out = (closest, any_hit, bind_np, own_row)
    _SWEEP_MEMO[memo_key] = out
    return out
