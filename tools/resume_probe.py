"""In-graph cost probe for the RESUME-mode fused kernel at small K.

The resume fix-up pass showed up at ~3.5 ms/call in the r3 leaf-op trace
for K=22528 — ~60% of a full 2.125M-lane main-kernel call — which is far
above its pro-rata work.  This probe times fused_push_walk(resume=True)
inside ONE jitted lax.scan (no dispatch bias) across K values, plus the
main kernel for reference.

Usage: python tools/resume_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vpic_tpu.core.types import Grid
from vpic_tpu.grid.partition import make_grid_arrays
from vpic_tpu.particles import push as ppush
from vpic_tpu.particles import push_pallas as pk


def main():
    nx = 128
    g = Grid(nx=nx, ny=nx, nz=1, dt=0.9 / (2 ** 0.5 * nx))
    ga = make_grid_arrays(g)
    rng = np.random.default_rng(0)
    interp = jnp.asarray(
        0.05 * rng.normal(size=(g.nv, 18)).astype(np.float32))
    table = ppush.make_interp_t(interp, g, ga.neighbor)
    params = jnp.asarray([0.01, 0.64, 0.64, 0.64], jnp.float32)
    strides = pk.face_strides(g)
    reps = 50

    def probe(tag, K, resume, **kw):
        x = rng.integers(1, nx + 1, K)
        y = rng.integers(1, nx + 1, K)
        vox = jnp.asarray(np.sort(np.asarray(g.voxel(x, y, 1), np.int32)))
        nr = 11 if resume else 7
        ps = jnp.asarray(np.vstack([
            rng.uniform(-0.9, 0.9, (3, K)),      # pos
            rng.uniform(-0.05, 0.05, (3, K)),    # rem (resume) / u
            rng.uniform(0.5, 1.5, (1, K)),       # q
        ] + ([np.asarray(vox)[None].astype(np.float32),
              rng.normal(0, 0.2, (3, K))] if resume else [])
        ).astype(np.float32))

        def body(c, _):
            a, _, _ = pk.fused_push_walk(
                vox, ps, table, params, strides, g.nv,
                n_walk=3, resume=resume, **kw)
            return c + jnp.sum(a), None

        f = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0), None,
                                         length=reps)[0])
        float(f())
        t0 = time.perf_counter()
        float(f())
        dt = (time.perf_counter() - t0) / reps
        print(f"{tag:38s} K={K:8d}  {dt*1e3:7.3f} ms/call", flush=True)

    for K in (9216, 22528, 45056, 90112):
        probe("resume", K, True)
    probe("main  (reference)", 2125824, False)
    probe("main  small", 22528, False)


if __name__ == "__main__":
    main()
