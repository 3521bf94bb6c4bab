"""Per-phase timings on the real chip: each advance-step phase jitted and
timed separately with device->host scalar-fetch barriers (the only
reliable barrier over the tunneled backend).

The sum won't exactly match one fused advance step (XLA overlaps/fuses
across phases inside the scan), but it localizes the cost.

Usage: python tools/phase_bench.py [npart] [nx] [reps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, reps, barrier):
    out = fn(*args)
    barrier(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    barrier(out)
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    npart = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    nx = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build
    from vpic_tpu.engine.step import make_advance
    from vpic_tpu.particles import aux as paux
    from vpic_tpu.particles import push as ppush
    from vpic_tpu.field import stencil, sync
    from vpic_tpu.sf import interp as sfi

    sim = _build(nx=nx, ny=nx, nz=1, npart=npart // 2)
    g = sim.grid
    comm = sim.comm
    sim.advance(2)          # warm state off the cold start
    st = sim.state
    sp = st.species[0]
    nb = st.grid_arrays.neighbor

    def bar_tree(x):
        leaf = jax.tree.leaves(x)[0]
        float(jnp.sum(jnp.ravel(leaf)[:1].astype(jnp.float32)))

    rows = []

    # -- sort --
    f_sort = jax.jit(lambda s: paux.sort_p(s, g))
    ms, _ = timed(f_sort, (sp,), reps, bar_tree)
    rows.append(("sort_p (1 species)", ms))

    # -- interp transpose (fused path prep) --
    from vpic_tpu.particles import push_pallas as pk
    f_it = jax.jit(lambda i: ppush.make_interp_t(i, g,
                                                 exc_t=st.grid_arrays.exc_t))
    ms, interp_t = timed(f_it, (st.interpolator,), reps, bar_tree)
    rows.append(("make_interp_t", ms))

    # -- fused push (1 species) --
    def push1(s, it, i):
        acc = jnp.zeros((g.nv, 12), dtype=jnp.float32)
        s2, acc = ppush.advance_p(s, i, acc, nb, g, n_walk=3,
                                  sorted_deposit=True, fused=True,
                                  interp_t=it,
                                  fix_cap=max(8192, s.max_np // 256))
        return s2, acc

    f_push = jax.jit(push1)
    ms, (_, acc) = timed(f_push, (sp, interp_t, st.interpolator), reps,
                         bar_tree)
    rows.append(("advance_p fused (1 species)", ms))

    # -- jf unload + sync --
    def jf(f, a):
        f = sfi.clear_jf(f, g)
        f = sfi.unload_accumulator(f, a, g)
        return sync.synchronize_jf(f, g, comm)

    f_jf = jax.jit(jf)
    ms, _ = timed(f_jf, (st.field, acc), reps, bar_tree)
    rows.append(("clear+unload+sync jf", ms))

    # -- field advance (b/2, e, b/2) --
    def fields(f):
        f = stencil.advance_b(f, g, 0.5)
        f = stencil.advance_e(f, g, st.materials, st.material_grid, comm)
        return stencil.advance_b(f, g, 0.5)

    f_f = jax.jit(fields)
    ms, _ = timed(f_f, (st.field,), reps, bar_tree)
    rows.append(("field advance", ms))

    # -- load_interpolator --
    f_li = jax.jit(lambda f: sfi.load_interpolator(f, g))
    ms, _ = timed(f_li, (st.field,), reps, bar_tree)
    rows.append(("load_interpolator", ms))

    # -- full step (sorting variant), for reference --
    adv = jax.jit(make_advance(g, comm, pcomm=None, opts=sim.opts))
    ms, _ = timed(adv, (st,), reps, bar_tree)
    rows.append(("FULL STEP (sorting variant)", ms))

    print(f"\n== phase timings ({npart/1e6:.1f}M total, {nx}x{nx}, "
          f"reps={reps}) ==")
    for name, ms in rows:
        print(f"  {name:34s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
