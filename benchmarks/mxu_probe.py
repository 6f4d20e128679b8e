"""Probe: matmul-form (MXU) intersection sweeps vs the production VPU forms.

The round-4 ceiling analysis priced only the VPU; this measures the other
unit. A surface test's dot products against per-surface CONSTANT vectors
are a (lanes, 3) @ (3, S) contraction: per lane-row r of a (ROWS, 128)
tile, build P_r = [ox_r; oy_r; oz_r] (3, 128) by sublane slicing and
matmul the (S, 3) geometry table against it on the MXU -> (S, 128)
per-surface values with surfaces in SUBLANES. The epilogue (root tests,
range gates, min-reduce) stays on the VPU in (S, 128) layout.

Variants measured (1M lanes, sphere tables, marginal-launch timing per
CLAUDE.md's tunnel methodology):
  dots_vpu / dots_mxu        — the contraction alone (both dot families)
  sweep_vpu                  — bigscene-style fori_loop closest hit
                               (t + row carry, no material columns)
  sweep_mxu_precise          — matmul dots + full stable-root epilogue in
                               (S, 128) + sublane argmin
  sweep_mxu_naive            — matmul dots + NAIVE-root selection
                               (neg_b - sqrt(discr); candidate filter per
                               VERDICT r4 — winner still needs a precise
                               recompute, measured separately)
  resolve_select             — winner material resolve, current form:
                               fori over S rows of where-selects (MAT cols)
  resolve_onehot             — winner material resolve via one-hot matmul
                               (S,128)^T @ (S,MAT) per lane-row

Run on the TPU: python benchmarks/mxu_probe.py [S] [--quick]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

LANE = 128
ROWS = 16
_PREC = (jax.lax.Precision.HIGH if os.environ.get("MXU_PREC") == "high"
         else jax.lax.Precision.HIGHEST)
EPS = np.float32(1e-3)
MAT = 16          # material columns for the resolve micro


def _rowmat(ref, r, *cols3):
    """(3, 128) matrix = rows r of three (ROWS,128) refs stacked."""
    return jnp.concatenate([c[r:r + 1, :] for c in cols3], axis=0)


# ---------------------------------------------------------------- dots only
def dots_vpu_kernel(S, tab_ref, ox, oy, oz, dx, dy, dz, out):
    """Both dot families (c.o and c.d) scalar-broadcast, accumulated."""
    acc = jnp.zeros((ROWS, LANE), jnp.float32)

    def body(s, acc):
        cx, cy, cz = tab_ref[s, 0], tab_ref[s, 1], tab_ref[s, 2]
        do = cx * ox[:] + cy * oy[:] + cz * oz[:]
        dd = cx * dx[:] + cy * dy[:] + cz * dz[:]
        return acc + do + dd

    acc = jax.lax.fori_loop(0, S, body, acc)
    out[:] = acc


def dots_mxu_kernel(S, tab_ref, ox, oy, oz, dx, dy, dz, out):
    W = tab_ref[:, 0:3]                       # (S, 3)
    for r in range(ROWS):
        Po = _rowmat(None, r, ox, oy, oz)     # (3, 128)
        Pd = _rowmat(None, r, dx, dy, dz)
        Do = jnp.dot(W, Po, preferred_element_type=jnp.float32,
                     precision=_PREC)  # (S,128)
        Dd = jnp.dot(W, Pd, preferred_element_type=jnp.float32,
                     precision=_PREC)
        out[r:r + 1, :] = jnp.sum(Do + Dd, axis=0, keepdims=True)


# ------------------------------------------------------------ closest sweeps
def sweep_vpu_kernel(S, tab_ref, ox, oy, oz, dx, dy, dz, t_out, row_out):
    """bigscene-style scalar-broadcast stable-root sweep (t+row carry)."""
    ox_, oy_, oz_ = ox[:], oy[:], oz[:]
    dx_, dy_, dz_ = dx[:], dy[:], dz[:]

    def body(s, cy):
        tb, rb = cy
        cx, cyv, cz, r = (tab_ref[s, 0], tab_ref[s, 1], tab_ref[s, 2],
                          tab_ref[s, 3])
        ocx = cx - ox_
        ocy = cyv - oy_
        ocz = cz - oz_
        neg_b = ocx * dx_ + ocy * dy_ + ocz * dz_
        px = ocx - dx_ * neg_b
        py = ocy - dy_ * neg_b
        pz = ocz - dz_ * neg_b
        discr = r * r - (px * px + py * py + pz * pz)
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        sq = jnp.sqrt(jnp.maximum(discr, 0.0))
        sgn = jnp.where(neg_b >= 0.0, np.float32(1.0), np.float32(-1.0))
        q = neg_b + sgn * sq
        tq = cc / q
        t1 = jnp.minimum(q, tq)
        t2 = jnp.maximum(q, tq)
        t1_ok = t1 > EPS
        t = jnp.where(t1_ok, t1, t2)
        accept = (discr >= 0) & (t1_ok | (t2 > EPS)) & (t < tb)
        tb = jnp.where(accept, t, tb)
        rb = jnp.where(accept, s, rb)
        return tb, rb

    tb = jnp.full((ROWS, LANE), np.float32(np.inf))
    rb = jnp.full((ROWS, LANE), np.int32(-1))
    tb, rb = jax.lax.fori_loop(0, S, body, (tb, rb))
    t_out[:] = tb
    row_out[:] = rb


def _mxu_row_dots(tab_ref, r, ox, oy, oz, dx, dy, dz):
    """Per-lane-row matmul dots. Returns (Dco, Dcd) each (S, 128) plus the
    per-lane shared scalars (o.d, |o|^2) as (1, 128)."""
    W = tab_ref[:, 0:3]
    Po = _rowmat(None, r, ox, oy, oz)
    Pd = _rowmat(None, r, dx, dy, dz)
    Dco = jnp.dot(W, Po, preferred_element_type=jnp.float32,
                  precision=_PREC)
    Dcd = jnp.dot(W, Pd, preferred_element_type=jnp.float32,
                  precision=_PREC)
    od = jnp.sum(Po * Pd, axis=0, keepdims=True)        # (1,128)
    o2 = jnp.sum(Po * Po, axis=0, keepdims=True)
    return Dco, Dcd, od, o2


def sweep_mxu_precise_kernel(S, tab_ref, ox, oy, oz, dx, dy, dz,
                             t_out, row_out):
    C2 = (tab_ref[:, 4:5])        # |c|^2 column, (S,1)
    R = (tab_ref[:, 3:4])
    R2 = R * R
    iota = jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 0)
    for r in range(ROWS):
        Dco, Dcd, od, o2 = _mxu_row_dots(tab_ref, r, ox, oy, oz, dx, dy, dz)
        neg_b = Dcd - od                       # oc.d  (S,128)
        oc2 = C2 - 2.0 * Dco + o2
        discr = R2 - oc2 + neg_b * neg_b
        cc = oc2 - R2
        sq = jnp.sqrt(jnp.maximum(discr, 0.0))
        sgn = jnp.where(neg_b >= 0.0, np.float32(1.0), np.float32(-1.0))
        q = neg_b + sgn * sq
        tq = cc / q
        t1 = jnp.minimum(q, tq)
        t2 = jnp.maximum(q, tq)
        t1_ok = t1 > EPS
        t = jnp.where(t1_ok, t1, t2)
        ok = (discr >= 0) & (t1_ok | (t2 > EPS))
        t = jnp.where(ok, t, np.float32(np.inf))
        tmin = jnp.min(t, axis=0, keepdims=True)               # (1,128)
        win = jnp.min(jnp.where(t == tmin, iota, np.int32(2 ** 30)),
                      axis=0, keepdims=True)
        t_out[r:r + 1, :] = tmin
        row_out[r:r + 1, :] = jnp.where(jnp.isinf(tmin), np.int32(-1), win)


def sweep_mxu_naive_kernel(S, tab_ref, ox, oy, oz, dx, dy, dz,
                           t_out, row_out):
    """Naive-root SELECTION (cancellation-prone; filter only)."""
    C2 = (tab_ref[:, 4:5])
    R = (tab_ref[:, 3:4])
    R2 = R * R
    iota = jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 0)
    for r in range(ROWS):
        Dco, Dcd, od, o2 = _mxu_row_dots(tab_ref, r, ox, oy, oz, dx, dy, dz)
        neg_b = Dcd - od
        oc2 = C2 - 2.0 * Dco + o2
        discr = R2 - oc2 + neg_b * neg_b
        sq = jnp.sqrt(jnp.maximum(discr, 0.0))
        t = neg_b - sq                          # near root, naive form
        t = jnp.where((discr >= 0) & (t > EPS), t, np.float32(np.inf))
        tmin = jnp.min(t, axis=0, keepdims=True)
        win = jnp.min(jnp.where(t == tmin, iota, np.int32(2 ** 30)),
                      axis=0, keepdims=True)
        t_out[r:r + 1, :] = tmin
        row_out[r:r + 1, :] = jnp.where(jnp.isinf(tmin), np.int32(-1), win)


# --------------------------------------------------------- material resolve
def resolve_select_kernel(S, tab_ref, row_ref, *outs):
    """Current form: per table row, mask-select every MAT column."""
    rid = row_ref[:]
    accs = [jnp.zeros((ROWS, LANE), jnp.float32) for _ in range(MAT)]

    def body(s, accs):
        m = rid == s
        return tuple(jnp.where(m, tab_ref[s, 8 + c], accs[c])
                     for c in range(MAT))

    accs = jax.lax.fori_loop(0, S, body, tuple(accs))
    for c in range(MAT):
        outs[c][:] = accs[c]


def resolve_onehot_kernel(S, tab_ref, row_ref, *outs):
    """One-hot matmul gather: (S,128)^T one-hot @ (S,MAT) table per row."""
    tabm = tab_ref[:, 8:8 + MAT]                      # (S, MAT)
    iota = jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 0)
    for r in range(ROWS):
        rid = row_ref[r:r + 1, :]                     # (1,128)
        oh = jnp.where(iota == rid, np.float32(1.0), np.float32(0.0))
        # contract over S: (S,MAT) x (S,128) -> (MAT, 128); HIGHEST is
        # EXACT for one-hot weights (the bf16x6 split of each table value
        # reassembles exactly under 1.0/0.0 multipliers)
        matT = jax.lax.dot_general(
            tabm, oh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PREC)
        for c in range(MAT):
            outs[c][r:r + 1, :] = matT[c:c + 1, :]


# ------------------------------------------------------------------ harness
def _timeit(fn, args, n_small=4, n_big=24):
    v = fn(jnp.int32(3), *args)
    jax.block_until_ready(v)

    def run(n, base):
        out = fn(jnp.int32(base), *args)
        _drain(out)
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(jnp.int32(base + 1 + i), *args)
        _drain(out)
        return time.perf_counter() - t0

    t_small, t_big = run(n_small, 100), run(n_big, 200)
    return (t_big - t_small) / (n_big - n_small)


def _drain(out):
    leaves = jax.tree.leaves(out)
    float(leaves[0].reshape(-1)[0])


def build(kernel, S, n_out, out_dtypes, tiles, extra_in=()):
    blk = pl.BlockSpec((ROWS, LANE), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    kfn = functools.partial(kernel, S)

    @jax.jit
    def f(salt, tab, *planes):
        # salt perturbs an input so the tunnel can't memoize the launch
        planes = (planes[0] + salt.astype(jnp.float32) * 1e-7,) + planes[1:]
        outs = pl.pallas_call(
            kfn, grid=(tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            + [blk] * len(planes),
            out_specs=[blk] * n_out,
            out_shape=[jax.ShapeDtypeStruct((tiles * ROWS, LANE), dt)
                       for dt in out_dtypes],
        )(tab, *planes)
        return outs

    return f


def main():
    quick = "--quick" in sys.argv
    S = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 1024
    tiles = 128 if quick else 512          # 0.26M / 1M lanes
    lanes = tiles * ROWS * LANE
    rng = np.random.default_rng(0)
    tab = np.zeros((S, 8 + MAT), np.float32)
    tab[:, :3] = rng.uniform(-30, 30, (S, 3))
    tab[:, 3] = rng.uniform(0.5, 2.0, S)
    tab[:, 4] = np.sum(tab[:, :3] ** 2, axis=1)       # |c|^2
    tab[:, 8:] = rng.uniform(0, 1, (S, MAT))
    tabj = jnp.asarray(tab)
    planes = [jnp.asarray(rng.standard_normal(
        (tiles * ROWS, LANE)).astype(np.float32)) for _ in range(6)]
    # normalize directions per lane
    dn = jnp.sqrt(planes[3] ** 2 + planes[4] ** 2 + planes[5] ** 2)
    planes[3:] = [p / dn for p in planes[3:]]

    results = {}

    def meas(name, kernel, n_out, dts, args):
        f = build(kernel, S, n_out, dts, tiles)
        try:
            dt = _timeit(f, args)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            results[name] = None
            return None
        gtests = S * lanes / dt / 1e9
        print(f"{name:22s} {dt * 1e3:8.3f} ms/launch   "
              f"{gtests:8.1f} G pair/s   ({lanes / 1e6:.2f}M lanes, S={S})")
        results[name] = dt
        return dt

    f32 = jnp.float32
    i32 = jnp.int32
    meas("dots_vpu", dots_vpu_kernel, 1, [f32], (tabj, *planes))
    meas("dots_mxu", dots_mxu_kernel, 1, [f32], (tabj, *planes))
    meas("sweep_vpu", sweep_vpu_kernel, 2, [f32, i32], (tabj, *planes))
    meas("sweep_mxu_precise", sweep_mxu_precise_kernel, 2, [f32, i32],
         (tabj, *planes))
    meas("sweep_mxu_naive", sweep_mxu_naive_kernel, 2, [f32, i32],
         (tabj, *planes))

    # winner rows for the resolve micro: random valid rows
    rows_np = rng.integers(0, S, (tiles * ROWS, LANE)).astype(np.int32)
    rowsj = jnp.asarray(rows_np)

    def build_resolve(kernel):
        blk = pl.BlockSpec((ROWS, LANE), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        kfn = functools.partial(kernel, S)

        @jax.jit
        def f(salt, tab, rows):
            rows = jnp.where(rows == salt, rows, rows)   # defeat memoization
            rows = (rows + salt) % S
            return pl.pallas_call(
                kfn, grid=(tiles,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), blk],
                out_specs=[blk] * MAT,
                out_shape=[jax.ShapeDtypeStruct((tiles * ROWS, LANE),
                                                jnp.float32)] * MAT,
            )(tab, rows)
        return f

    for name, kern in (("resolve_select", resolve_select_kernel),
                       ("resolve_onehot", resolve_onehot_kernel)):
        f = build_resolve(kern)
        try:
            dt = _timeit(f, (tabj, rowsj))
            print(f"{name:22s} {dt * 1e3:8.3f} ms/launch   "
                  f"({MAT} cols, {lanes / 1e6:.2f}M lanes)")
            results[name] = dt
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            results[name] = None

    # correctness: precise sweep must agree with the vpu sweep on t
    fv = build(sweep_vpu_kernel, S, 2, [f32, i32], tiles)
    fm = build(sweep_mxu_precise_kernel, S, 2, [f32, i32], tiles)
    tv, rv = fv(jnp.int32(0), tabj, *planes)
    tm, rm = fm(jnp.int32(0), tabj, *planes)
    tvn, tmn = np.asarray(tv), np.asarray(tm)
    both = np.isfinite(tvn) & np.isfinite(tmn)
    if both.any():
        rel = np.abs(tvn[both] - tmn[both]) / np.maximum(tvn[both], 1e-6)
        print(f"precise-vs-vpu: hit-agreement "
              f"{(np.isfinite(tvn) == np.isfinite(tmn)).mean():.6f}, "
              f"t rel err p50/p99.99/max "
              f"{np.percentile(rel, 50):.2e}/{np.percentile(rel, 99.99):.2e}"
              f"/{rel.max():.2e}")
    fn_ = build(sweep_mxu_naive_kernel, S, 2, [f32, i32], tiles)
    tn, rn = fn_(jnp.int32(0), tabj, *planes)
    rnn, rvn_ = np.asarray(rn), np.asarray(rv)
    print(f"naive-vs-vpu winner agreement: {(rnn == rvn_).mean():.6f}")


if __name__ == "__main__":
    main()
