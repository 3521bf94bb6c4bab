"""On-chip A/B of the packed re-sort paths at bench scale: the
multi-operand bitonic (aux.sort_p_packed's lax.sort) vs the O(n) two-run
merge (sort_pallas.merge_sort_packed), on a synthetic near-sorted block
shaped like the 128^2/2M-per-species bench species.

Usage: python tools/sort_bench.py [n] [nvk] [mover_frac]
"""

import sys
import time

sys.setrecursionlimit(20_000)

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from vpic_tpu.particles import sort_pallas as sps  # noqa: E402

n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_125_824
nvk = int(sys.argv[2]) if len(sys.argv) > 2 else 16_384
frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05

rng = np.random.default_rng(0)
np_ = int(n * 0.98)
key = np.sort(rng.integers(0, nvk, size=np_)).astype(np.int32)
pk = np.zeros((8, n), np.float32)
pk[:7, :np_] = rng.standard_normal((7, np_)).astype(np.float32)
pk[7, :np_] = key
key0 = np.full((n,), nvk, np.int32)
key0[:np_] = key
v = np.arange(nvk + 3, dtype=np.int32)
full = np.concatenate([key, np.full((n - np_,), nvk, np.int32)])
ctot = np.searchsorted(full, v, side="left").astype(np.int32)

# perturb: neighbour strides (+-1, +-nx) like one resort interval of drift
m = rng.random(np_) < frac
delta = rng.choice([-128, -1, 1, 128], size=np_)
pk[7, :np_] = np.where(m, (key + delta) % nvk, key).astype(np.float32)

pkj = jnp.asarray(pk)
npj = jnp.int32(np_)
k0j = jnp.asarray(key0)
ctj = jnp.asarray(ctot)

m_cap = -(-int(n * max(frac * 1.4, 0.02)) // 128) * 128


def timeit(f, *args, reps=10):
    # the axon tunnel does not sync on block_until_ready; materializing a
    # scalar does (tools/prim_bench.py methodology)
    out = f(*args)
    _ = [np.asarray(x.ravel()[0]) for x in jax.tree.leaves(out)][0]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _ = [np.asarray(x.ravel()[0]) for x in jax.tree.leaves(out)][0]
    return (time.perf_counter() - t0) / reps, out


@jax.jit
def bitonic(p):
    key = (p[7] + 0.5).astype(jnp.int32)
    key = jnp.where(jnp.arange(n) < np_, key, jnp.int32(2 ** 30))
    out = jax.lax.sort((key,) + tuple(p[r] for r in range(7)),
                       num_keys=1, is_stable=False)
    return jnp.stack(out[1:8] + (out[0].astype(jnp.float32),), axis=0)


t_bit, _ = timeit(bitonic, pkj)
print(f"bitonic 7-op      {t_bit * 1e3:8.2f} ms")

merge = lambda p, k0, ct: sps.merge_sort_packed(  # noqa: E731
    p, npj, k0, ct, nvk, m_cap=m_cap, B=512, W=512, win_r=1024)
t_mrg, (pk2, k02, ct2, anom) = timeit(merge, pkj, k0j, ctj)
print(f"merge (m_cap={m_cap})  {t_mrg * 1e3:8.2f} ms   anomaly={int(anom)}")

# steady state: re-perturb the merged output and sort again
key2 = np.asarray(pk2[7, :np_]).astype(np.int32)
m2 = rng.random(np_) < frac
d2 = rng.choice([-128, -1, 1, 128], size=np_)
pk3 = np.asarray(pk2).copy()
pk3[7, :np_] = np.where(m2, (key2 + d2) % nvk, key2).astype(np.float32)
t_ss, (pk4, _, _, anom2) = timeit(merge, jnp.asarray(pk3), k02, ct2)
k4 = np.asarray(pk4[7, :np_]).astype(np.int32)
ok = bool(np.all(np.diff(k4) >= 0))
print(f"merge steady       {t_ss * 1e3:8.2f} ms   anomaly={int(anom2)} "
      f"sorted={ok}")
print(f"speedup (steady): {t_bit / t_ss:.2f}x")
