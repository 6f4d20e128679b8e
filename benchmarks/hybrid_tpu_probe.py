"""TPU probe: the hybrid wavefront engine at scene scale.

Same scene/lane/timing conventions as bigscene_tpu_probe.py (steady-state
marginal, completion forced by a host-value fetch). Env: NSPH (1024),
DEPTH (3), CULL (cone|off), SAMPLER (random|sobol).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jaxcache"
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
import numpy as np
import jax.numpy as jnp
from kytpu.scene import builders
from kytpu.kernels import wavefront as wf
from kytpu.integrator import fast as kfast
from kytpu.integrator.hybrid import li_path_hybrid
from kytpu.scene.scene import generate_rays

N = int(os.environ.get("NSPH", "1024"))
DEPTH = int(os.environ.get("DEPTH", "3"))
CULL = os.environ.get("CULL", "cone")
SAMPLER = os.environ.get("SAMPLER", "random")
sc = builders.random_spheres(n=N, width=256, height=256, seed=0)
print("surfaces:", int(sc.mat_kind.shape[0]), "cull:", CULL, flush=True)
kcfg = wf.KernelConfig(rows=16, cull=CULL)
cfg = kfast.FastConfig(max_depth=DEPTH, sampler=SAMPLER)
cam = sc.camera
npix = cam.width * cam.height
xs = (jnp.arange(npix) % cam.width).astype(jnp.float32) + 0.5
ys = (jnp.arange(npix) // cam.width).astype(jnp.float32) + 0.5
o, d = generate_rays(cam, jnp.stack([xs, ys], axis=-1))
rep = max(1, (1 << 20) // npix)
o = jnp.tile(o, (rep, 1)); d = jnp.tile(d, (rep, 1))
nlanes = o.shape[0]
pid = jnp.tile(jnp.arange(npix, dtype=jnp.int32), rep)
print("lanes:", nlanes, "depth:", DEPTH, flush=True)

key = jax.random.key(3)

@jax.jit
def run1(o, d, seed):
    keys = jax.vmap(lambda p: jax.random.fold_in(
        jax.random.fold_in(key, seed), p))(pid)
    return li_path_hybrid(sc, o, d, keys, cfg, kcfg=kcfg)

t0 = time.time()
out = run1(o, d, jnp.int32(0))
v = float(out[0, 0])
t1 = time.time()
print(f"compile+first run: {t1-t0:.1f}s", flush=True)
print("any nan:", bool(jnp.isnan(out).any()), "mean:", float(out.mean()),
      flush=True)

def run(k, seed0):
    outs = None
    for i in range(k):
        outs = run1(o, d, jnp.int32(seed0 + i))
    return float(outs[0, 0])

run(2, 100)
tA = time.time(); run(4, 200); tB = time.time()
run(2, 300)
tC = time.time(); run(16, 400); tD = time.time()
dt = (tD - tC) - (tB - tA)
rate = (16 - 4) * nlanes / dt
print(f"marginal: {dt/12*1000:.2f} ms/launch  {rate/1e6:.3f} M camera-rays/s",
      flush=True)
