"""Runtime in-step particle injection (misc.cxx:16-106 analogue):
Simulation.make_injector from the user_particle_injection hook must keep
Gauss's law satisfied (rhob update) and age particles by a partial push."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_smoke import make_warm_plasma
from vpic_tpu.deck.api import Simulation


def _gauss_rms(sim):
    from vpic_tpu.field import stencil, sync
    from vpic_tpu.particles import aux as paux
    from vpic_tpu.sf import interp as sfi

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

    return float(rms(st))


def _make_refluxing_deck(K=16, age=True, npart=1024):
    """A warm box whose hook injects K particles per step through the
    runtime injector (a refluxing-wall-style deck)."""
    sim = Simulation(seed=3)
    sim.define_units(cvac=1.0, eps0=1.0)
    L = 1.0
    nx = ny = nz = 8
    dt = 0.95 * sim.courant_length(L, L, L, nx, ny, nz)
    sim.define_timestep(dt)
    sim.define_periodic_grid(0, 0, 0, L, L, L, nx, ny, nz)
    sim.define_material("vacuum")
    e = sim.define_species("electron", q_m=-1.0, max_np=8 * npart)
    x = sim.uniform(npart, 0, L)
    y = sim.uniform(npart, 0, L)
    z = sim.uniform(npart, 0, L)
    ut = 0.05
    sim.inject_particle(e, x, y, z, sim.maxwellian(npart, ut),
                        sim.maxwellian(npart, ut),
                        sim.maxwellian(npart, ut), q=-1.0 / npart)

    inj = sim.make_injector("electron")
    rng = np.random.default_rng(11)
    pos = rng.uniform(0.1, 0.9, size=(3, K))
    mom = rng.normal(0, ut, size=(3, K)).astype(np.float32)
    ages = rng.uniform(0, 1, size=K).astype(np.float32) if age else None

    def refill(state, acc, f):
        return inj(state, acc, f,
                   x=pos[0], y=pos[1], z=pos[2],
                   ux=mom[0], uy=mom[1], uz=mom[2],
                   q=np.full(K, -1.0 / npart, np.float32),
                   age=ages, update_rhob=True)

    sim.finalize(user_particle_injection=refill)
    return sim, K


def test_injector_grows_np_and_conserves_charge():
    sim, K = _make_refluxing_deck(K=16)
    sp0 = int(np.asarray(sim.state.species[0].np))
    steps = 6
    sim.advance(steps)
    sp = sim.state.species[0]
    # every step's K-block claimed (no gating in this deck)
    assert int(np.asarray(sp.np)) == sp0 + K * steps
    # rhob update keeps Gauss's law at fp32-roundoff scale even though
    # charge is appearing from nowhere every step (misc.cxx:92-96)
    v = _gauss_rms(sim)
    assert v < 5e-4, v
    e = sim.energies()
    assert all(np.isfinite(x) for x in e.values()), e


def test_injector_without_rhob_breaks_gauss():
    """Control: the same deck with update_rhob=False must violate Gauss's
    law by O(injected charge) — proves the conserving test has teeth."""
    sim = Simulation(seed=3)
    L = 1.0
    nx = ny = nz = 8
    sim.define_units(cvac=1.0, eps0=1.0)
    sim.define_timestep(0.95 * sim.courant_length(L, L, L, nx, ny, nz))
    sim.define_periodic_grid(0, 0, 0, L, L, L, nx, ny, nz)
    sim.define_material("vacuum")
    npart = 1024
    e = sim.define_species("electron", q_m=-1.0, max_np=8 * npart)
    sim.inject_particle(e, sim.uniform(npart, 0, L),
                        sim.uniform(npart, 0, L), sim.uniform(npart, 0, L),
                        0.0, 0.0, 0.0, q=-1.0 / npart)
    inj = sim.make_injector("electron")

    def refill(state, acc, f):
        return inj(state, acc, f, x=np.full(16, 0.31), y=np.full(16, 0.57),
                   z=np.full(16, 0.43), ux=0.0, uy=0.0, uz=0.0,
                   q=np.full(16, -1.0 / npart, np.float32),
                   update_rhob=False)

    sim.finalize(user_particle_injection=refill)
    sim.advance(6)
    v = _gauss_rms(sim)
    assert v > 5e-3, v


def test_injector_age_partial_push():
    """age != 0 walks the particle a fraction of a step immediately
    (misc.cxx:98-105): with zero fields, the aged lane must advance by
    age * u/gamma * cvac*dt in each axis; the age=0 lane must not move
    until the next step's push."""
    sim = Simulation(seed=5)
    L = 1.0
    nx = ny = nz = 8
    dt = 0.5 * sim.courant_length(L, L, L, nx, ny, nz)
    sim.define_timestep(dt)
    sim.define_units(cvac=1.0, eps0=1.0)
    sim.define_periodic_grid(0, 0, 0, L, L, L, nx, ny, nz)
    sim.define_material("vacuum")
    e = sim.define_species("electron", q_m=-1.0, max_np=1024)

    inj = sim.make_injector("electron")
    ux = np.float32(0.3)
    hits = {"n": 0}

    def refill(state, acc, f):
        # only on the first step (static unrolled deck would re-inject
        # every step; gate by the traced step counter)
        first = state.step == 0
        valid = jnp.array([True, True]) & first
        return inj(state, acc, f,
                   x=np.array([0.3, 0.3]), y=np.array([0.52, 0.52]),
                   z=np.array([0.52, 0.52]),
                   ux=np.array([ux, ux]), uy=0.0, uz=0.0,
                   q=np.array([0.0, 0.0], np.float32),  # massless probe
                   age=jnp.array([0.0, 1.0]), valid=valid,
                   update_rhob=False)

    sim.finalize(user_particle_injection=refill)
    hits["n"] += 1
    sim.advance(1)
    sp = sim.state.species[0]
    assert int(np.asarray(sp.np)) == 2
    g = sim.grid
    # reconstruct global x of both lanes
    i = np.asarray(sp.i)[:2]
    cx = i % g.nxg
    xg = (cx - 1 + (np.asarray(sp.dx)[:2] + 1) / 2) * g.dx
    gamma = np.sqrt(1 + ux * ux)
    expect_aged = 0.3 + float(ux / gamma) * g.cvac * g.dt
    # injection happens after the step's main push, so the age=0 lane sits
    # exactly at the injection point after advance(1)
    lane_x = sorted(xg)
    np.testing.assert_allclose(lane_x[0], 0.3, rtol=0, atol=1e-6)
    np.testing.assert_allclose(lane_x[1], expect_aged, rtol=1e-5)
