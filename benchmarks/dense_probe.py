"""Probe: dense sphere closest-hit sweep with surfaces in SUBLANES.

Current table sweep (bigscene._closest_hit_tables) broadcasts one scalar
table row against a (rows, 128) ray tile and carries 20 winner planes:
measured 24.7 G pair-tests/s at 1026 spheres (41.5 ms for 1M lanes).

This layout instead processes (8 surfaces x 128 rays) per vreg op: table
rows live in sublanes (vector loads, no scalar-unit traffic), rays
broadcast along lanes, and the carry is only (t, row) — winner material
resolution happens once per ray afterwards. Also measures an any-hit
variant (no carry at all).

Run on the TPU: python benchmarks/dense_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jaxcache"

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

LANE = 128
ROWS = 16          # ray tile = ROWS x 128 lanes
NS = 1088          # spheres (multiple of 8)
NB = NS // 8
EPS = np.float32(1e-3)


def closest_kernel(tab_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                   t_ref, row_ref):
    """tab: (NS, 8) [cx cy cz r r2 pad pad pad] in VMEM."""
    for g in range(ROWS):
        ox = ox_ref[g:g + 1, :]
        oy = oy_ref[g:g + 1, :]
        oz = oz_ref[g:g + 1, :]
        dx = dx_ref[g:g + 1, :]
        dy = dy_ref[g:g + 1, :]
        dz = dz_ref[g:g + 1, :]

        def body(i, cy):
            tb, rb = cy
            blk = tab_ref[pl.dslice(i * 8, 8)]
            cx = blk[:, 0:1]
            cyv = blk[:, 1:2]
            cz = blk[:, 2:3]
            r = blk[:, 3:4]
            ocx = cx - ox                               # (8, 128)
            ocy = cyv - oy
            ocz = cz - oz
            neg_b = ocx * dx + ocy * dy + ocz * dz
            px = ocx - dx * neg_b
            py = ocy - dy * neg_b
            pz = ocz - dz * neg_b
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
            accept = (discr >= 0) & (r > 0) \
                & (t1_ok | (t2 > EPS)) & (t < tb)
            rowf = (jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
                    + i * 8).astype(jnp.float32)
            tb = jnp.where(accept, t, tb)
            rb = jnp.where(accept, rowf, rb)
            return tb, rb

        t8 = jnp.full((8, LANE), np.float32(np.inf))
        r8 = jnp.full((8, LANE), np.float32(-1.0))
        t8, r8 = jax.lax.fori_loop(0, NB, body, (t8, r8))
        tmin = jnp.min(t8, axis=0, keepdims=True)          # (1, 128)
        rwin = jnp.min(jnp.where(t8 == tmin, r8, np.float32(1e9)),
                       axis=0, keepdims=True)
        t_ref[g:g + 1, :] = tmin
        row_ref[g:g + 1, :] = rwin


def anyhit_kernel(tab_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  h_ref):
    for g in range(ROWS):
        ox = ox_ref[g:g + 1, :]
        oy = oy_ref[g:g + 1, :]
        oz = oz_ref[g:g + 1, :]
        dx = dx_ref[g:g + 1, :]
        dy = dy_ref[g:g + 1, :]
        dz = dz_ref[g:g + 1, :]

        def body(i, h):
            blk = tab_ref[pl.dslice(i * 8, 8)]
            cx = blk[:, 0:1]
            cyv = blk[:, 1:2]
            cz = blk[:, 2:3]
            r2 = blk[:, 4:5]
            ocx = cx - ox
            ocy = cyv - oy
            ocz = cz - oz
            neg_b = ocx * dx + ocy * dy + ocz * dz
            oc2 = ocx * ocx + ocy * ocy + ocz * ocz
            discr = r2 - oc2 + neg_b * neg_b
            hit = (discr >= 0) & (neg_b > EPS)
            return h + jnp.where(hit, np.float32(1.0), np.float32(0.0))

        h8 = jax.lax.fori_loop(0, NB, body, jnp.zeros((8, LANE), jnp.float32))
        h_ref[g:g + 1, :] = jnp.max(h8, axis=0, keepdims=True)


def run(kernel, n_out, reps=16, tiles=512):
    rng = np.random.default_rng(0)
    tab = np.zeros((NS, 8), np.float32)
    tab[:, :3] = rng.uniform(-30, 30, (NS, 3))
    tab[:, 3] = rng.uniform(0.5, 2.0, NS)
    tab[:, 4] = tab[:, 3] ** 2
    tabj = jnp.asarray(tab)
    planes = []
    for _ in range(6):
        planes.append(jnp.asarray(
            rng.standard_normal((tiles * ROWS, LANE)).astype(np.float32)))

    blk = pl.BlockSpec((ROWS, LANE), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)

    @jax.jit
    def f(tab, *pl_in):
        return pl.pallas_call(
            kernel, grid=(tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [blk] * 6,
            out_specs=[blk] * n_out,
            out_shape=[jax.ShapeDtypeStruct((tiles * ROWS, LANE),
                                            jnp.float32)] * n_out,
        )(tab, *pl_in)

    out = f(tabj, *planes)
    _ = float(out[0][0, 0])

    def burst(k, base):
        o = None
        for i in range(k):
            o = f(tabj + np.float32(base + i) * 1e-9, *planes)
        return float(o[0][0, 0])

    burst(2, 1000)
    t0 = time.perf_counter()
    burst(4, 2000)
    t1 = time.perf_counter()
    burst(2, 3000)
    t2 = time.perf_counter()
    burst(16, 4000)
    t3 = time.perf_counter()
    dt = ((t3 - t2) - (t1 - t0)) / 12.0
    pairs = tiles * ROWS * LANE * NS
    return pairs / dt


if __name__ == "__main__":
    r1 = run(closest_kernel, 2)
    print(f"dense closest (t,row carry): {r1/1e9:.1f} G pairs/s "
          f"(current scalar sweep: 24.7 G)")
    r2 = run(anyhit_kernel, 1)
    print(f"dense any-hit: {r2/1e9:.1f} G pairs/s")
