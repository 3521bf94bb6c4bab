"""Compare particle-sort strategies on the real chip.

Usage: python tools/sort_bench.py [n]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_250_000
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 17000, n).astype(np.int32))
    # the real workload is NEAR-sorted: one step moves ~20% of lanes by
    # +-64 (tiled y) or +-1 (x) in key value
    ks0 = np.sort(rng.integers(0, 17000, n).astype(np.int32))
    mv = rng.random(n)
    disp = np.where(mv < 0.08, 64, np.where(mv < 0.16, -64,
                    np.where(mv < 0.24, 1, np.where(mv < 0.32, -1, 0))))
    key_near = jnp.asarray(np.clip(ks0 + disp, 0, 17000 - 1).astype(np.int32))
    cols = [jnp.asarray(rng.normal(size=n).astype(np.float32))
            for _ in range(8)]

    def timeit(tag, fn, *args):
        # a device->host scalar fetch is the only reliable barrier over
        # the tunneled backend (block_until_ready returns early there)
        out = fn(*args)
        float(jnp.sum(out[0]))
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(jnp.sum(out[0]))
        dt = (time.perf_counter() - t0) / reps
        print(f"{tag:40s} {dt*1e3:7.2f} ms")
        return out

    @jax.jit
    def multi_operand(key, *cols):
        return jax.lax.sort((key,) + cols, num_keys=1, is_stable=True)

    @jax.jit
    def argsort_gather_packed(key, *cols):
        ks, perm = jax.lax.sort(
            (key, jnp.arange(key.shape[0], dtype=jnp.int32)),
            num_keys=1, is_stable=True)
        packed = jnp.stack(cols, axis=-1)       # (n, 8)
        out = packed[perm]
        return (ks,) + tuple(out[:, i] for i in range(len(cols)))

    @jax.jit
    def argsort_gather_cols(key, *cols):
        ks, perm = jax.lax.sort(
            (key, jnp.arange(key.shape[0], dtype=jnp.int32)),
            num_keys=1, is_stable=True)
        return (ks,) + tuple(c[perm] for c in cols)

    @jax.jit
    def key_iota_only(key):
        return jax.lax.sort(
            (key, jnp.arange(key.shape[0], dtype=jnp.int32)),
            num_keys=1, is_stable=True)

    @jax.jit
    def multi_operand_unstable(key, *cols):
        return jax.lax.sort((key,) + cols, num_keys=1, is_stable=False)

    @jax.jit
    def multi_operand_7(key, *cols):
        return jax.lax.sort((key,) + cols[:6], num_keys=1, is_stable=True)

    def oddeven_passes(npass, blk=65536):
        """npass rounds of block-pair odd-even merge: vmapped sorts of
        adjacent 2*blk chunks (offset alternates blk).  Restores bounded
        disorder at ~log^2(2*blk)/log^2(n) the cost of a full sort."""

        @jax.jit
        def f(key, *cols):
            ops = (key,) + cols
            m = key.shape[0]
            for p in range(npass):
                off = blk if p % 2 else 0
                nseg = (m - off) // (2 * blk)
                if nseg == 0:
                    continue
                lo, hi = off, off + nseg * 2 * blk
                segs = tuple(o[lo:hi].reshape(nseg, 2 * blk) for o in ops)
                sorted_segs = jax.vmap(
                    lambda *s: jax.lax.sort(s, num_keys=1, is_stable=True)
                )(*segs)
                ops = tuple(
                    jax.lax.concatenate(
                        [o[:lo], ss.reshape(-1), o[hi:]], 0)
                    for o, ss in zip(ops, sorted_segs))
            return ops

        return f

    timeit("lax.sort 9 operands (current)", multi_operand, key, *cols)
    timeit("lax.sort 9 op UNSTABLE", multi_operand_unstable, key, *cols)
    timeit("lax.sort 7 operands", multi_operand_7, key, *cols)
    timeit("argsort + packed row-gather", argsort_gather_packed, key, *cols)
    timeit("argsort + 8 col gathers", argsort_gather_cols, key, *cols)
    timeit("argsort alone (key+iota)", key_iota_only, key)
    print("---- near-sorted key (one unsorted step of drift) ----")
    timeit("NEAR lax.sort 9 operands", multi_operand, key_near, *cols)
    timeit("NEAR lax.sort 9 op UNSTABLE", multi_operand_unstable,
           key_near, *cols)
    timeit("NEAR oddeven x2 64k", oddeven_passes(2), key_near, *cols)
    timeit("NEAR oddeven x2 128k", oddeven_passes(2, 131072),
           key_near, *cols)
    o = timeit("NEAR oddeven x3 64k", oddeven_passes(3), key_near, *cols)
    k2 = np.asarray(o[0])
    print(f"  oddeven x3 unsorted frac: "
          f"{np.mean(k2[1:] < k2[:-1]):.2e}")


if __name__ == "__main__":
    main()
