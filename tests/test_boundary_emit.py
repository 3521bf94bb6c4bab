"""Custom boundary handlers (maxwellian_reflux, absorb_tally) and surface
emitters."""

import numpy as np
import pytest

from vpic_tpu.deck.api import Simulation
from vpic_tpu.boundary.models import AbsorbTally, MaxwellianReflux
from vpic_tpu.emit.models import Ccube


def drifting_box(pbc_handler=None, seed=2, nx=8, ut=0.3, drift=0.5):
    sim = Simulation(seed=seed)
    sim.define_units(1.0, 1.0)
    L = 1.0
    sim.define_timestep(0.7 * sim.courant_length(L, L, L, nx, nx, 1))
    sim.define_absorbing_grid(0, 0, 0, L, L, L, nx, nx, 1)
    # periodic in y,z; custom/absorbing only on x faces
    from vpic_tpu.core.types import PERIODIC_FIELDS
    for face in (1, 2, 4, 5):
        sim.set_domain_field_bc(face, PERIODIC_FIELDS)
        sim.set_domain_particle_bc(face, "periodic")
    e = sim.define_species("electron", -1.0, 4096)
    n = 512
    sim.inject_particle(
        e, sim.uniform(n, 0.05, 0.95), sim.uniform(n, 0, L),
        sim.uniform(n, 0, L),
        sim.maxwellian(n, ut) + drift, sim.maxwellian(n, ut),
        sim.maxwellian(n, ut), q=-1.0 / n)
    return sim, e


def alive_count(sim):
    return int(np.asarray(sim.state.species[0].alive).sum())


def test_absorbing_walls_kill_particles():
    sim, e = drifting_box()
    sim.finalize()
    n0 = alive_count(sim)
    sim.advance(12)
    n1 = alive_count(sim)
    assert n1 < n0
    # absorbed charge became rhob (negative electrons -> negative rhob)
    rhob = np.asarray(sim.state.field.rhob)
    assert rhob.min() < 0


def test_absorb_tally_counts():
    sim, e = drifting_box()
    tally = sim.define_boundary(AbsorbTally(n_species=1))
    sim.set_domain_particle_bc(0, tally)
    sim.set_domain_particle_bc(3, tally)
    sim.finalize()
    n0 = alive_count(sim)
    sim.advance(12)
    n1 = alive_count(sim)
    counts = np.asarray(sim.state.boundary_state[0])
    assert counts[0] == n0 - n1 > 0


def test_maxwellian_reflux_conserves_particles():
    sim, e = drifting_box()
    reflux = sim.define_boundary(
        MaxwellianReflux(ut_para=(0.2,), ut_perp=(0.2,)))
    sim.set_domain_particle_bc(0, reflux)
    sim.set_domain_particle_bc(3, reflux)
    sim.finalize()
    n0 = alive_count(sim)
    sim.advance(12)
    assert alive_count(sim) == n0
    assert int(sim.state.species[0].nm) == 0
    # all particles still inside
    sp = sim.state.species[0]
    alive = np.asarray(sp.alive)
    assert np.all(np.abs(np.asarray(sp.dx)[alive]) <= 1.0 + 1e-6)


def test_ccube_emitter_injects():
    sim = Simulation(seed=3)
    sim.define_units(1.0, 1.0)
    L = 1.0
    nx = 8
    sim.define_timestep(0.5 * sim.courant_length(L, L, L, nx, nx, 1))
    sim.define_absorbing_grid(0, 0, 0, L, L, L, nx, nx, 1)
    e = sim.define_species("electron", -1.0, 8192)
    # uniform E pushing electrons off the low-x wall: q_m*E_x > 0 => E_x < 0
    sim.set_field("ex", lambda x, y, z: -0.1)
    emitter = Ccube(sid=0, q_m=-1.0, components=((), ()),
                    n_emit_per_face=2, ut_para=0.05, ut_perp=0.05,
                    q_emit=-1e-4)
    sim.define_surface_emitter(emitter, face=0)
    sim.finalize()
    assert alive_count(sim) == 0
    sim.advance(3)
    assert alive_count(sim) > 0
    assert int(sim.state.species[0].nm) == 0
