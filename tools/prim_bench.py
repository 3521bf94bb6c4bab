"""Microbenchmark the TPU primitives a counting-sort redesign would lean
on, vs the incumbent multi-operand bitonic ``lax.sort`` (sort_p).

Candidates measured at bench scale (n = 2.125M lanes, nv = 16384 keys):
  sort9        the incumbent: 7-operand unstable lax.sort (sort_p_packed)
  sort1        key-only unstable sort (lower bound for bitonic work)
  sortkv       (key<<? | rank) single-fused-operand sort + perm extract
  gather8      apply a permutation to the (8, n) packed block by take
  scatter8     apply it by scatter (the counting-sort placement op)
  gather1      1-D f32 gather (per-lane table lookups, e.g. start[key])
  segsum       (nv,) histogram of keys via segment_sum (counting phase)
  searchsort   jnp.searchsorted of n keys into a sorted (nv,) table

Usage: python tools/prim_bench.py [n] [nv]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    _ = [np.asarray(x.ravel()[0]) for x in jax.tree.leaves(out)][0]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = [np.asarray(x.ravel()[0]) for x in jax.tree.leaves(out)][0]
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:12s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_125_824
    nv = int(sys.argv[2]) if len(sys.argv) > 2 else 16384

    rng = np.random.default_rng(0)
    # near-sorted keys: sorted + per-lane jitter of +-1 voxel-row (the
    # one-crossing-per-step drift pattern)
    base = np.sort(rng.integers(0, nv, n).astype(np.int32))
    jit = rng.choice([-128, -1, 0, 1, 128], size=n,
                     p=[0.05, 0.05, 0.8, 0.05, 0.05]).astype(np.int32)
    keys = np.clip(base + jit, 0, nv - 1).astype(np.int32)
    key = jnp.asarray(keys)
    rows = jnp.asarray(rng.standard_normal((8, n)), jnp.float32)
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    near_perm = jnp.asarray(
        np.clip(np.arange(n) + rng.integers(-32768, 32768, n), 0,
                n - 1).astype(np.int32))   # banded indices (not a perm)
    table = jnp.asarray(rng.standard_normal(nv), jnp.float32)

    @jax.jit
    def sort9(key, rows):
        return jax.lax.sort((key,) + tuple(rows[i] for i in range(6)),
                            num_keys=1, is_stable=False)

    @jax.jit
    def sort1(key):
        return jax.lax.sort((key,), num_keys=1, is_stable=False)

    @jax.jit
    def sortkv(key):
        idx = jnp.arange(n, dtype=jnp.int32)
        fused = key.astype(jnp.int64) * n + idx
        s = jax.lax.sort((fused,), num_keys=1, is_stable=False)[0]
        return (s % n).astype(jnp.int32)

    @jax.jit
    def sortkv2(key):
        idx = jnp.arange(n, dtype=jnp.int32)
        return jax.lax.sort((key, idx), num_keys=1, is_stable=False)[1]

    @jax.jit
    def gather8(rows, perm):
        return jnp.take(rows, perm, axis=1)

    @jax.jit
    def gather8band(rows, nperm):
        return jnp.take(rows, nperm, axis=1)

    @jax.jit
    def scatter8(rows, perm):
        return jnp.zeros_like(rows).at[:, perm].set(rows)

    @jax.jit
    def gather1(table, key):
        return table[key]

    @jax.jit
    def segsum(key):
        return jax.ops.segment_sum(jnp.ones_like(key, jnp.float32), key,
                                   num_segments=nv)

    @jax.jit
    def scatteradd1(key):
        return jnp.zeros((nv,), jnp.float32).at[key].add(1.0)

    @jax.jit
    def searchsort(table_keys, key):
        return jnp.searchsorted(table_keys, key)

    sorted_keys = jnp.sort(jnp.asarray(
        rng.integers(0, 2 ** 30, nv).astype(np.int32)))

    print(f"n={n} nv={nv}", flush=True)
    timeit("sort9", sort9, key, rows)
    timeit("sort1", sort1, key)
    timeit("sortkv_i64", sortkv, key)
    timeit("sortkv_2op", sortkv2, key)
    timeit("gather8", gather8, rows, perm)
    timeit("gather8band", gather8band, rows, near_perm)
    timeit("scatter8", scatter8, rows, perm)
    timeit("gather1", gather1, table, key)
    timeit("segsum", segsum, key)
    timeit("scatteradd1", scatteradd1, key)
    timeit("searchsort", searchsort, sorted_keys, key)


if __name__ == "__main__":
    main()
