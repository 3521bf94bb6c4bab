"""In-graph (scan-looped) cost split of the fused kernel: full walk vs
skip_deposit vs segment count — no per-dispatch tunnel bias (standalone
pallas_call timings over the tunnel carry ~2-4 ms of dispatch; a jitted
scan of 30 calls amortizes it away).

Usage: python tools/kernel_scan_bench.py [npart] [nx]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_125_824
    nx = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    g = Grid(nx=nx, ny=nx, nz=1, dt=0.9 / (2 ** 0.5 * nx))
    ga = make_grid_arrays(g)
    rng = np.random.default_rng(0)
    x = rng.integers(1, nx + 1, n)
    y = rng.integers(1, nx + 1, n)
    vox = jnp.asarray(np.sort(np.asarray(g.voxel(x, y, 1), np.int32)))
    interp = jnp.asarray(
        0.05 * rng.normal(size=(g.nv, 18)).astype(np.float32))
    table = ppush.make_interp_t(interp, g, ga.neighbor)
    pstate = jnp.asarray(np.vstack([
        rng.uniform(-1, 1, (3, n)),
        rng.normal(0, 0.2, (3, n)),
        rng.uniform(0.5, 1.5, (1, n))]).astype(np.float32))
    params = jnp.asarray([0.01, 0.64, 0.64, 0.64], jnp.float32)
    strides = pk.face_strides(g)
    reps = 30

    def probe(tag, **kw):
        def body(c, _):
            a, _, _ = pk.fused_push_walk(vox, pstate, table, params,
                                         strides, g.nv, **kw)
            return c + jnp.sum(a), None

        f = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0), None,
                                         length=reps)[0])
        float(f())
        t0 = time.perf_counter()
        float(f())
        dt = (time.perf_counter() - t0) / reps
        print(f"{tag:34s} {dt*1e3:7.3f} ms/call  {n/dt/1e6:8.1f} M/s",
              flush=True)

    probe("walk3 (2D default)", n_walk=3)
    probe("walk3 skip_deposit", n_walk=3, skip_deposit=True)
    probe("walk2", n_walk=2)
    probe("walk2 skip_deposit", n_walk=2, skip_deposit=True)
    probe("walk1", n_walk=1)
    probe("walk1 skip_deposit", n_walk=1, skip_deposit=True)


if __name__ == "__main__":
    main()
