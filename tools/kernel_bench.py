"""Micro-benchmark of the fused push+walk kernel on realistic data.

Usage: python tools/kernel_bench.py [npart] [nx]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_500_000
    nx = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    g = Grid(nx=nx, ny=nx, nz=1, dt=0.9 / (2 ** 0.5 * nx))
    ga = make_grid_arrays(g)
    rng = np.random.default_rng(0)
    x = rng.integers(1, nx + 1, n)
    y = rng.integers(1, nx + 1, n)
    vox = np.sort(np.asarray(g.voxel(x, y, 1), np.int32))
    interp = jnp.asarray(
        0.05 * rng.normal(size=(g.nv, 18)).astype(np.float32))
    table = ppush.make_interp_t(interp, g, ga.neighbor)
    pstate = jnp.asarray(np.vstack([
        rng.uniform(-1, 1, (3, n)),
        rng.normal(0, 0.2, (3, n)),
        rng.uniform(0.5, 1.5, (1, n))]).astype(np.float32))
    voxj = jnp.asarray(vox)
    params = jnp.asarray([0.01, 0.64, 0.64, 0.64], jnp.float32)
    strides = pk.face_strides(g)

    def run(tag, **kw):
        f = lambda v, p: pk.fused_push_walk(v, p, table, params, strides,
                                            g.nv, **kw)
        out = f(voxj, pstate)
        # scalar fetch = reliable barrier over the tunneled backend
        float(jnp.sum(out[0]))
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(voxj, pstate)
        float(jnp.sum(out[0]))
        dt = (time.perf_counter() - t0) / reps
        acc_sum = float(jnp.sum(out[0]))
        n_exp = int(jnp.sum(out[1][pk.PEXPT] > 0.5))
        print(f"{tag:34s} {dt*1e3:7.2f} ms  {n/dt/1e6:8.1f} M/s  "
              f"exports={n_exp}  acc_sum={acc_sum:.6f}")

    run("WIDE walk3 (2D default)", n_walk=3)
    run("rowloop walk3", n_walk=3, wide=False)
    run("WIDE walk4", n_walk=4)
    run("rowloop walk4", wide=False)
    run("WIDE walk3, no deposit", n_walk=3, skip_deposit=True)
    run("rowloop walk3, no deposit", n_walk=3, skip_deposit=True,
        wide=False)


if __name__ == "__main__":
    main()
