"""Multi-PROCESS distribution test: real OS processes, gloo collectives.

Spawns 2 worker processes (tests/mh_worker.py), each exposing 2 virtual CPU
chips, joined by jax.distributed.initialize into one 4-device global
("tile", "spp") mesh — the process-level replacement for the reference's
OpenMP fork (ky.cpp:3696-3701). Asserts:

  - the multi-process sharded render is BITWISE identical to the
    single-device render (each worker checks this locally);
  - the sharded train step produces a finite loss and byte-identical
    replicated parameters on every host;
  - per-host film-tile checkpoints (each host writes only its own tiles)
    reassemble to the full film exactly.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

NPROC = 2


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.multihost
def test_two_process_render_and_train(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "mh_worker.py")
    port = _free_port()
    env = dict(os.environ)
    # workers configure their own device count; drop the suite's 8-device
    # forcing so each process really owns only its 2 local chips
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(NPROC), str(port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(NPROC)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"

    results = []
    for i in range(NPROC):
        with open(tmp_path / f"proc{i}.json") as f:
            results.append(json.load(f))

    for r in results:
        assert r["global_devices"] == 2 * NPROC
        assert r["local_devices"] == 2
        assert r["render_bitwise"], (
            f"multi-process render != single-device render "
            f"(maxdiff {r['render_maxdiff']})")
        assert r["loss_finite"]

    # replicated state is byte-identical across hosts
    assert results[0]["loss"] == results[1]["loss"]
    assert results[0]["params_sample"] == results[1]["params_sample"]

    # per-host tile files reassemble to the full film
    from kytpu.dist.multihost import load_film_tiles
    full, step = load_film_tiles(str(tmp_path / "film"))
    assert step == 1
    assert full.shape == (16 * 8, 3)
    # content: the reassembled film equals worker 0's bitwise-verified
    # single-device render, exactly
    img_local = np.load(tmp_path / "img_local.npy")
    np.testing.assert_array_equal(full, img_local.reshape(-1, 3))
    # and the per-proc files cover disjoint, complete rows
    covered = np.zeros(16 * 8, bool)
    for k in range(NPROC):
        with np.load(tmp_path / f"film.proc{k}.npz") as z:
            for name in z.files:
                if name == "__meta__":
                    continue
                _, _, a, b = name.split("_")
                assert not covered[int(a):int(b)].any(), "overlapping tiles"
                covered[int(a):int(b)] = True
    assert covered.all(), "film rows missing from per-host checkpoints"
    assert np.isfinite(full).all()


def test_cross_topology_resume(tmp_path):
    """A film-tile checkpoint written on a (2,2) mesh resumes on a (4,1)
    mesh with an IDENTICAL final film — the utils/checkpoint.py claim
    ("resume on a different topology, because lane radiance depends only
    on (seed, sample_id, pixel_id)"). Single-process, 8 virtual CPU
    devices; the per-chunk sample association (2 samples per chunk) is
    held fixed across topologies so the f32 reduction order matches."""
    import jax

    from kytpu.dist import mesh as kmesh
    from kytpu.dist import multihost as mh
    from kytpu.integrator import path as kpath
    from kytpu.integrator.render import render
    from kytpu.scene import builders

    sc = builders.cornell_box(width=16, height=8)
    cfg = kpath.PathConfig(max_depth=2)
    npix = 16 * 8

    mesh_a = kmesh.make_mesh(jax.devices()[:4], shape=(2, 2))
    acc = mh.accumulate_tiles(sc, mesh_a, (0, 2), seed=5, cfg=cfg,
                              samples_per_chunk=2)
    mh.save_film_tiles(str(tmp_path / "film"), acc, step=2,
                       total_rows=npix)

    rows, step = mh.load_film_tiles(str(tmp_path / "film"))
    assert step == 2
    mesh_b = kmesh.make_mesh(jax.devices()[:4], shape=(4, 1))
    acc2 = mh.accumulate_tiles(sc, mesh_b, (2, 4), seed=5, cfg=cfg,
                               samples_per_chunk=2, accum=rows)
    final = mh.all_gather_host(acc2)[:npix] / 4.0

    ref = np.asarray(render(sc, spp=4, seed=5, cfg=cfg, clamp=False,
                            rays_per_pass=2 * npix))
    np.testing.assert_array_equal(final, ref.reshape(-1, 3))
