"""TPU probe: the table-driven big-scene megakernel at scale.

Measures camera-rays/s (lanes per launch / marginal launch time, the same
convention as benchmarks/run.py --scale for the jnp engines) on
builders.random_spheres. Steady-state marginal timing per CLAUDE.md:
time 16 launches vs 4, force completion with a host-value fetch.

Env: NSPH (default 1024), DEPTH (default 3).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jaxcache"
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
import numpy as np
import jax.numpy as jnp
from kytpu.scene import builders
from kytpu.kernels import wavefront as wf, bigscene as bs
from kytpu.scene.scene import generate_rays

N = int(os.environ.get("NSPH", "1024"))
DEPTH = int(os.environ.get("DEPTH", "3"))
CULL = os.environ.get("CULL", "cone")
sc = builders.random_spheres(n=N, width=256, height=256, seed=0)
print("surfaces:", int(sc.mat_kind.shape[0]), "cull:", CULL, flush=True)
cfg = wf.KernelConfig(max_depth=DEPTH, rows=int(os.environ.get("ROWS","16")), cull=CULL, sweep=os.environ.get("SWEEP", "auto"))
cam = sc.camera
npix = cam.width * cam.height
xs = (jnp.arange(npix) % cam.width).astype(jnp.float32) + 0.5
ys = (jnp.arange(npix) // cam.width).astype(jnp.float32) + 0.5
o, d = generate_rays(cam, jnp.stack([xs, ys], axis=-1))
rep = max(1, (1 << 20) // npix)
if os.environ.get("BINPIX", "0") == "1":
    # ray binning: group primary-miss pixels together (their tiles die
    # after bounce 0) and cluster hit pixels by Morton code of the hit
    # point (coherent tiles -> tight cull cones at bounce 1 and for NEE)
    import jax as _jax
    from kytpu.scene import scene as kscene
    hit = kscene.intersect(sc, o, d)
    hp = np.asarray(hit.position); valid = np.asarray(hit.valid)
    lo = hp[valid].min(axis=0); hi = hp[valid].max(axis=0)
    q = np.clip((hp - lo) / np.maximum(hi - lo, 1e-9) * 1023, 0, 1023).astype(np.uint64)
    def spread(x):
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x
    key_m = (spread(q[:,0])<<np.uint64(2)) | (spread(q[:,1])<<np.uint64(1)) | spread(q[:,2])
    key_m = np.where(valid, key_m, np.uint64(1)<<np.uint64(62))
    perm = np.argsort(key_m, kind="stable")
    o = jnp.asarray(np.asarray(o)[perm]); d = jnp.asarray(np.asarray(d)[perm])
    print("binned pixels: miss frac", float((~valid).mean()), flush=True)
o = jnp.tile(o, (rep, 1)); d = jnp.tile(d, (rep, 1))
nlanes = o.shape[0]
print("lanes:", nlanes, "depth:", DEPTH, flush=True)

t0 = time.time()
big = bs.make_bigscene_tracer(sc, cfg)
out = big(sc, o, d, 0)
v = float(out[0, 0])
t1 = time.time()
print(f"compile+first run: {t1-t0:.1f}s", flush=True)
print("any nan:", bool(jnp.isnan(out).any()), "mean:", float(out.mean()),
      flush=True)

def run(k, seed0):
    outs = None
    for i in range(k):
        outs = big(sc, o, d, seed0 + i)
    return float(outs[0, 0])

run(2, 100)
tA = time.time(); run(4, 200); tB = time.time()
run(2, 300)
tC = time.time(); run(16, 400); tD = time.time()
dt = (tD - tC) - (tB - tA)
rate = (16 - 4) * nlanes / dt
print(f"marginal: {dt/12*1000:.2f} ms/launch  {rate/1e6:.3f} M camera-rays/s",
      flush=True)
