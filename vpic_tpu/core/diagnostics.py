"""Observability: checksums, phase timers, and logging — the reference's
auxiliary diagnostics (SURVEY.md §5).

- Checksums (misc.cxx:107-171 + util/CheckSum.hxx): SHA-1 digests of the
  field / particle state for bitwise regression checks across runs and
  topologies.
- Phase timers (vpic.hxx:214-218 p/s/g/f/u_time accumulated around every
  phase of advance, reported at status_interval): here a phase-profiled
  step that jits each phase separately and synchronizes between them.
- sim_log (deck_wrapper.cxx:45-53): rank-0 stderr logging.
"""

from __future__ import annotations

import hashlib
import sys
import time

import jax
import numpy as np


def sim_log(msg, rank: int = 0):
    """Rank-0 stderr log line (deck_wrapper.cxx:48-53)."""
    if rank == 0:
        print(f"[vpic_tpu] {msg}", file=sys.stderr, flush=True)


def checksum_fields(state) -> str:
    """SHA-1 over every field component (output_checksum_fields,
    misc.cxx:109-139)."""
    h = hashlib.sha1()
    f = state.field
    for name in ("ex", "ey", "ez", "div_e_err", "cbx", "cby", "cbz",
                 "div_b_err", "tcax", "tcay", "tcaz", "rhob",
                 "jfx", "jfy", "jfz", "rhof"):
        h.update(np.ascontiguousarray(np.asarray(getattr(f, name))))
    return h.hexdigest()


def checksum_species(state, sid: int) -> str:
    """SHA-1 over the live particles of one species, in canonical (sorted
    by voxel, then tag) order so it is invariant to slot permutation
    (output_checksum_species, misc.cxx:141-171)."""
    sp = state.species[sid]
    alive = np.asarray(sp.alive)
    cols = [np.asarray(getattr(sp, k))[alive]
            for k in ("i", "tag", "dx", "dy", "dz", "ux", "uy", "uz", "q")]
    order = np.lexsort((cols[2], cols[1], cols[0]))
    h = hashlib.sha1()
    for c in cols:
        h.update(np.ascontiguousarray(c[order]))
    return h.hexdigest()


class PhaseTimers:
    """Accumulating stopwatch set mirroring p/s/g/f/u_time."""

    PHASES = ("particle", "sort", "guard", "field", "user")

    def __init__(self):
        self.t = {k: 0.0 for k in self.PHASES}
        self.steps = 0

    def add(self, phase, dt):
        self.t[phase] += dt

    def report(self) -> str:
        n = max(self.steps, 1)
        return " ".join(f"{k}={v / n * 1e3:.2f}ms" for k, v in self.t.items())


def time_phases(sim, n_steps: int = 3) -> dict:
    """Measure per-phase device time by running each phase as its own
    jitted function with synchronization (debug utility; the production
    step stays fully fused)."""
    from ..engine.step import make_advance
    from ..particles import aux as paux
    from ..particles import push as ppush
    from ..field import stencil, sync
    import jax.numpy as jnp

    g, st = sim.grid, sim.state
    nb = st.grid_arrays.neighbor
    out = {}

    def barrier(r):
        # a device->host scalar fetch is the only reliable barrier over
        # remote/tunneled backends (block_until_ready can return early)
        import numpy as _np
        leaves = [x for x in jax.tree.leaves(r)
                  if hasattr(x, "dtype") and not jax.dtypes.issubdtype(
                      x.dtype, jax.dtypes.prng_key)]
        if leaves:
            _np.asarray(jax.tree.leaves(leaves[-1])[0]).ravel()[:1]

    def timed(name, fn, *args):
        r = fn(*args)
        barrier(r)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            r = fn(*args)
        barrier(r)
        out[name] = (time.perf_counter() - t0) / n_steps
        return r

    # mirror the production step's path selection (engine/step.py)
    import os
    fused = not (jax.default_backend() == "cpu"
                 or os.environ.get("VPIC_TPU_DISABLE_PALLAS"))
    n_axes = (g.gnx > 1) + (g.gny > 1) + (g.gnz > 1)
    n_walk = min(4, n_axes + 1)

    acc0 = jnp.zeros((g.nv, 12), jnp.float32)
    interp_t = None
    if fused:
        interp_t = timed("make_interp_t", jax.jit(
            lambda ip: ppush.make_interp_t(ip, g,
                                           exc_t=st.grid_arrays.exc_t)),
            st.interpolator)
    for sp in st.species:
        timed(f"sort[{sp.name}]",
              jax.jit(lambda s: paux.sort_p(s, g)), sp)
        timed(f"advance_p[{sp.name}]",
              jax.jit(lambda s, a, it: ppush.advance_p(
                  s, st.interpolator, a, nb, g, n_walk=n_walk,
                  sorted_deposit=fused, fused=fused, interp_t=it)),
              sp, acc0, interp_t)
    timed("advance_b", jax.jit(lambda f: stencil.advance_b(f, g, 0.5)),
          st.field)
    timed("advance_e", jax.jit(lambda f: stencil.advance_e(
        f, g, st.materials, st.material_grid, sim.comm)), st.field)
    timed("synchronize_jf",
          jax.jit(lambda f: sync.synchronize_jf(f, g, sim.comm)), st.field)
    from ..sf import interp as sfi
    timed("load_interpolator",
          jax.jit(lambda f: sfi.load_interpolator(f, g)), st.field)
    timed("unload_accumulator",
          jax.jit(lambda f, a: sfi.unload_accumulator(f, a, g)),
          st.field, acc0)
    timed("full_step", sim._advance_fn, st)
    return out
