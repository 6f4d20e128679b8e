"""TPU probe: table-kernel fwd+bwd at scene scale (residual backward).

Env: NSPH (default 1024), DEPTH (default 3), LANES (default 1<<18).
timeout 2400 python benchmarks/bigscene_grad_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
import jax.numpy as jnp

from kytpu.kernels import bigscene as bs
from kytpu.kernels import wavefront as wf
from kytpu.scene import builders
from kytpu.scene.scene import generate_rays

N = int(os.environ.get("NSPH", "1024"))
DEPTH = int(os.environ.get("DEPTH", "3"))
LANES = int(os.environ.get("LANES", str(1 << 18)))
sc = builders.random_spheres(n=N, width=256, height=256, seed=0)
cfg = wf.KernelConfig(max_depth=DEPTH, rows=int(os.environ.get("ROWS", "16")))
cam = sc.camera
npix = cam.width * cam.height
pid = jnp.arange(LANES, dtype=jnp.int32) % npix
xs = (pid % cam.width).astype(jnp.float32) + 0.5
ys = (pid // cam.width).astype(jnp.float32) + 0.5
o, d = generate_rays(cam, jnp.stack([xs, ys], axis=-1))
jax.block_until_ready((o, d))
print(f"surfaces {int(sc.mat_kind.shape[0])} lanes {LANES} depth {DEPTH}",
      flush=True)

tracer = bs.make_bigscene_diff_tracer(sc, cfg, backward="residual")
env0 = jnp.zeros(3, jnp.float32)


@jax.jit
def fwd_bwd(seed):
    def loss(dd, ss, ee):
        return jnp.sum(tracer(dd, ss, ee, env0, o, d, seed)) / LANES
    return jax.value_and_grad(loss, argnums=(0, 1, 2))(
        sc.mat_diffuse, sc.mat_specular, sc.emission)


t0 = time.time()
v, _ = fwd_bwd(jnp.int32(1))
float(v)
print(f"compile+first: {time.time()-t0:.1f}s", flush=True)


def run(k, base):
    v = None
    for i in range(k):
        v, _ = fwd_bwd(jnp.int32(base + i))
    return float(v)


run(2, 100)
tA = time.time(); run(4, 200); tB = time.time()
tC = time.time(); run(12, 300); tD = time.time()
dt = ((tD - tC) - (tB - tA)) / 8
print(f"marginal {dt*1e3:.2f} ms/launch  "
      f"{LANES/dt/1e6:.3f} M camera-rays/s fwd+bwd", flush=True)
