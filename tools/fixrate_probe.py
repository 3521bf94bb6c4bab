"""Measure the ACTUAL fix-up traffic of the bench deck: per-species
kernel export counts (PEXPT), out-of-window counts, and dropped movers
(sp.nm) over a super-cycle — the data for sizing step.py's fix_cap
tiers (every fix lane costs sort/kernel/scatter work proportional to
the CAP, not the traffic).

Usage: python tools/fixrate_probe.py [npart] [nx] [steps]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    npart = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    nx = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    nz = int(os.environ.get("PROBE_NZ", 1))

    from __graft_entry__ import _build
    from vpic_tpu.particles import push as ppush
    from vpic_tpu.particles import push_pallas as pk
    from vpic_tpu.engine.step import StepOptions

    sim = _build(nx=nx, ny=nx, nz=nz, npart=npart // 2)
    g = sim.grid

    # drive the public advance to steady state, then probe each species'
    # raw kernel outputs one step at a time
    sim.advance(8)

    ga = sim.state.grid_arrays
    table = ppush.make_interp_t(sim.state.interpolator, g,
                                exc_t=ga.exc_t)
    for step in range(steps):
        sim.advance(1)
        # reading .state forces the lazy unpack of the persistent packed
        # mirror (voxels back in row-major space; round-3 ADVICE fix)
        st = sim.state
        for sp_i, sp in enumerate(st.species):
            alive = sp.alive
            vox = jnp.where(alive, sp.i, 0)
            klay = pk.kernel_layout(g)
            nvk = pk.kernel_nv(g)
            vox_k = vox if klay == "plain" else pk.kvox_of(g, vox)
            strides = pk.kernel_strides(g)
            window, pre = pk.kernel_window(g)
            # mirror the real push path's density-aware layout
            lay = pk.pick_layout(nvk, sp.max_np, window, pre)
            window, pre = lay["window"], lay["pre"]
            pstate = jnp.stack([sp.dx, sp.dy, sp.dz, sp.ux, sp.uy, sp.uz,
                                jnp.where(alive, sp.q, 0.0)], axis=0)
            qdt_2mc = (0.5 * sp.q_m * g.dt / g.cvac).astype(jnp.float32)
            params = jnp.stack([
                qdt_2mc, jnp.float32(g.cvac * g.dt * g.rdx),
                jnp.float32(g.cvac * g.dt * g.rdy),
                jnp.float32(g.cvac * g.dt * g.rdz)]).astype(jnp.float32)
            n_walk = int(os.environ.get("PROBE_NWALK",
                                        3 if nz == 1 else 4))
            _, pout, in_win = pk.fused_push_walk(
                vox_k, pstate, table, params, strides, nvk,
                n_walk=n_walk, window=window, pre=pre,
                block=lay["block"],
                wraps=pk.kernel_wraps(g), mod=pk.kernel_mod(g))
            expt = int(jnp.sum((pout[pk.PEXPT] > 0.5) & alive))
            oow = int(jnp.sum(~in_win & alive))
            nm = int(np.asarray(sp.nm))
            live = int(np.asarray(sp.np))
            print(f"step {step} sp{sp_i} live={live} exports={expt} "
                  f"({100*expt/live:.3f}%) out_of_window={oow} "
                  f"({100*oow/live:.3f}%) nm_dropped={nm}", flush=True)


if __name__ == "__main__":
    main()
