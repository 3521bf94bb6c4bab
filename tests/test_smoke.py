"""End-to-end smoke: a 3D uniform warm plasma in a periodic vacuum box must
conserve charge exactly and energy approximately (SURVEY.md §7 step 3)."""

import numpy as np
import pytest

import vpic_tpu
from vpic_tpu.deck.api import Simulation


def make_warm_plasma(nx=8, ny=8, nz=8, npart=2048, seed=7):
    sim = Simulation(seed=seed)
    sim.define_units(cvac=1.0, eps0=1.0)
    L = 1.0
    dt = 0.95 * sim.courant_length(L, L, L, nx, ny, nz)
    sim.define_timestep(dt)
    sim.define_periodic_grid(0, 0, 0, L, L, L, nx, ny, nz)
    sim.define_material("vacuum")
    electron = sim.define_species("electron", q_m=-1.0, max_np=2 * npart)

    x = sim.uniform(npart, 0, L)
    y = sim.uniform(npart, 0, L)
    z = sim.uniform(npart, 0, L)
    ut = 0.05
    sim.inject_particle(electron, x, y, z,
                        sim.maxwellian(npart, ut),
                        sim.maxwellian(npart, ut),
                        sim.maxwellian(npart, ut),
                        q=-1.0 / npart)
    sim.finalize()
    return sim


def total_charge(sim):
    st = sim.state
    g = sim.grid
    rhof = np.asarray(st.field.rhof)
    # periodic: each physical node appears twice on wrapped planes after
    # sync; sum interior nodes [1..n] only to count each exactly once
    return rhof[1:g.nz + 1, 1:g.ny + 1, 1:g.nx + 1].sum()


def test_imports():
    assert vpic_tpu.__version__


def test_energy_and_charge_conservation():
    sim = make_warm_plasma()
    e0 = sim.energies()
    total0 = sum(e0.values())
    assert np.isfinite(total0) and total0 > 0

    n_steps = 20
    sim.opts = sim.opts  # defaults
    sim.advance(n_steps)

    for sp in sim.state.species:
        assert int(sp.nm) == 0  # no unprocessed movers

    e1 = sim.energies()
    total1 = sum(e1.values())
    drift = abs(total1 - total0) / total0
    assert drift < 2e-3, (e0, e1)


def test_gauss_law_consistency():
    """After steps, div E must still match rho (charge conservation of the
    deposit): rerun the div-e-err computation and check rms is tiny."""
    from vpic_tpu.field import stencil, sync
    from vpic_tpu.particles import aux as paux
    from vpic_tpu.sf import interp as sfi
    import jax

    sim = make_warm_plasma()
    sim.advance(5)
    g, st, comm = sim.grid, sim.state, sim.comm

    @jax.jit
    def rms(st):
        f = sfi.clear_rhof(st.field, g)
        for sp in st.species:
            f = paux.accumulate_rho_p(f, sp, g)
        f = sync.synchronize_rho(f, g, comm)
        f = stencil.compute_div_e_err(f, g, st.materials, st.material_grid,
                                      comm)
        err, vol = stencil.local_rms_div_e_err(f, g)
        return stencil.finish_rms(g, err, vol)

    v = float(rms(st))
    # fp32 roundoff-level divergence error, not O(rho) ~ npart/V
    assert v < 5e-4, v


def test_particle_stays_in_bounds():
    sim = make_warm_plasma(npart=512)
    sim.advance(10)
    sp = sim.state.species[0]
    alive = np.asarray(sp.alive)
    for c in ("dx", "dy", "dz"):
        v = np.asarray(getattr(sp, c))[alive]
        assert np.all(np.abs(v) <= 1.0 + 1e-6), (c, v.min(), v.max())
    i = np.asarray(sp.i)[alive]
    g = sim.grid
    x = i % g.nxg
    y = (i // g.nxg) % g.nyg
    z = i // (g.nxg * g.nyg)
    assert x.min() >= 1 and x.max() <= g.nx
    assert y.min() >= 1 and y.max() <= g.ny
    assert z.min() >= 1 and z.max() <= g.nz
