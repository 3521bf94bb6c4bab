"""Custom boundary handlers (maxwellian_reflux, absorb_tally) and surface
emitters."""

import numpy as np
import pytest

from vpic_tpu.deck.api import Simulation
from vpic_tpu.boundary.models import AbsorbTally, MaxwellianReflux
from vpic_tpu.emit.models import Ccube, ChildLangmuir, Ivory


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


def _emitter_sim(model_cls, thresh=0.0, ex=-0.1, m=2):
    sim = Simulation(seed=3)
    sim.define_units(1.0, 1.0)
    L = 1.0
    nx = 8
    sim.define_timestep(0.5 * sim.courant_length(L, L, L, nx, nx, 1))
    sim.define_absorbing_grid(0, 0, 0, L, L, L, nx, nx, 1)
    sim.define_species("electron", -1.0, 8192)
    # uniform E pushing electrons off the low-x wall: q_m*E_x > 0 => E_x < 0
    sim.set_field("ex", lambda x, y, z: ex)
    emitter = model_cls(sid=0, q_m=-1.0, components=((), ()),
                        n_emit_per_face=m, ut_para=0.05, ut_perp=0.05,
                        thresh_e_norm=thresh)
    sim.define_surface_emitter(emitter, face=0)
    sim.finalize()
    return sim


def _ref_qp(law_factor, g, q_m, e_x, m):
    """NumPy transcription of the EMIT_PARTICLES charge law
    (child-langmuir.c:49-52 / ccube.c:50-53 / ivory.c:50-53) for an
    x-face: qp = eps0 dy dz dt sqrt(F |q_m ex^3| / dx)/m, negated for
    q_m < 0."""
    qp = (g.eps0 * g.dy * g.dz * g.dt
          * np.sqrt(law_factor * abs(q_m * e_x * e_x * e_x) / g.dx) / m)
    return -qp if q_m < 0 else qp


@pytest.mark.parametrize("model_cls,law_factor", [
    (ChildLangmuir, 32.0 / 81.0),
    (Ccube, 1.0),
    (Ivory, 1.0 / 6.0),
])
def test_emitter_charge_law_parity(model_cls, law_factor):
    ex = -0.1
    m = 2
    sim = _emitter_sim(model_cls, ex=ex, m=m)
    assert alive_count(sim) == 0
    sim.advance(1)
    sp = sim.state.species[0]
    alive = np.asarray(sp.alive)
    assert alive.sum() > 0
    q = np.asarray(sp.q)[alive]
    expected = _ref_qp(law_factor, sim.grid, -1.0, ex, m)
    np.testing.assert_allclose(q, expected, rtol=1e-5)
    assert int(sim.state.species[0].nm) == 0


def test_emitter_thresh_e_norm_gates():
    # |E| = 0.1 below the 0.2 threshold -> no emission (ccube.c:48)
    sim = _emitter_sim(Ccube, thresh=0.2)
    sim.advance(2)
    assert alive_count(sim) == 0
    # threshold below |E| -> emission resumes
    sim = _emitter_sim(Ccube, thresh=0.05)
    sim.advance(2)
    assert alive_count(sim) > 0
    # ChildLangmuir has no threshold gate (child-langmuir.c)
    sim = _emitter_sim(ChildLangmuir, thresh=0.2)
    sim.advance(2)
    assert alive_count(sim) > 0


def test_volume_emitter_components_and_face_skip():
    """define_volume_emitter builds face-less components; stock face-law
    models skip them (ccube.c:101 default branch)."""
    sim = Simulation(seed=4)
    sim.define_units(1.0, 1.0)
    L = 1.0
    nx = 8
    sim.define_timestep(0.5 * sim.courant_length(L, L, L, nx, nx, 1))
    sim.define_absorbing_grid(0, 0, 0, L, L, L, nx, nx, 1)
    sim.define_species("electron", -1.0, 8192)
    sim.set_field("ex", lambda x, y, z: -0.1)
    emitter = Ccube(sid=0, q_m=-1.0, components=((), ()),
                    n_emit_per_face=2)
    reg = sim.define_volume_emitter(emitter, lambda x, y, z: x < 0.5)
    vox, faces = reg.components
    assert len(vox) == (nx // 2) * nx      # half the cells (2D: nz=1)
    assert all(f == -1 for f in faces)
    sim.finalize()
    sim.advance(2)
    assert alive_count(sim) == 0           # face-laws don't volume-emit


def test_region_surface_emitter_components():
    """region= form selects exterior-cell faces touching the region
    (deck_wrapper.cxx:390-463)."""
    from vpic_tpu.emit.models import region_surface_components
    sim = Simulation(seed=5)
    sim.define_units(1.0, 1.0)
    L = 1.0
    nx = 8
    sim.define_timestep(0.5 * sim.courant_length(L, L, L, nx, nx, 1))
    sim.define_absorbing_grid(0, 0, 0, L, L, L, nx, nx, 1)
    g = sim.grid
    # region = low-x half; exterior cells just right of x=0.5 emit through
    # their LOW-x face (face 0), one per (y,z) column
    vox, faces = region_surface_components(g, lambda x, y, z: x < 0.5)
    assert (faces == 0).sum() == nx * 1
    # the reference probes ghost centers too (deck_wrapper.cxx:396): a
    # region lying just outside the low-x edge makes every low-x boundary
    # cell's low face an emitting component via its ghost-center probe
    vox2, faces2 = region_surface_components(
        g, lambda x, y, z: x < -0.01)
    assert (faces2 == 0).sum() == nx and len(faces2) == nx
