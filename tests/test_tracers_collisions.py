"""Tracer trajectory accumulation (tracer.cxx analogue), the collision
deck-section hook, and the banded-dump global header."""

import numpy as np
import pytest

from vpic_tpu import Simulation


def build(n=500, nx=8, tracer_stride=50, seed=3, **hooks):
    L = 1.0
    sim = Simulation(seed=seed)
    sim.define_units(1.0, 1.0)
    sim.define_timestep(0.9 * sim.courant_length(L, L, L, nx, nx, 1))
    sim.define_periodic_grid(0, 0, 0, L, L, L, nx, nx, 1)
    sim.define_material("vacuum")
    e = sim.define_species("electron", -1.0, 4 * n)
    sim.inject_particle(
        e, sim.uniform(n, 0, L), sim.uniform(n, 0, L), sim.uniform(n, 0, L),
        sim.maxwellian(n, 0.1), sim.maxwellian(n, 0.1),
        sim.maxwellian(n, 0.1), q=-1.0 / n)
    if tracer_stride:
        sim.make_tracers(e, "e_tracer", stride=tracer_stride)
    sim.finalize(**hooks)
    return sim


def test_tracer_trajectories(tmp_path):
    sim = build()
    n_tr = 10  # 500 / 50
    steps = 6
    sim.collect_trajectories()
    for _ in range(steps):
        sim.advance(1)
        sim.collect_trajectories()

    from vpic_tpu.io import tracers as iot

    # consolidated layout
    paths = sim.dump_traj(tmp_path / "traj")
    assert len(paths) == 1
    trajs = iot.read_traj_dir(tmp_path / "traj", "e_tracer")
    assert len(trajs) == n_tr
    g = sim.grid
    for tag, rows in trajs.items():
        assert rows.shape == (steps + 1, 8)
        t = rows[:, 0]
        assert np.all(np.diff(t) > 0)                   # monotone time
        np.testing.assert_allclose(np.diff(t), g.dt, rtol=1e-5)
        x, y, z = iot.global_positions(g, rows)
        assert np.all((x >= 0) & (x <= 1))
        assert np.all((y >= 0) & (y <= 1))
        # tracers move: the trajectory is not a fixed point
        assert np.ptp(x) + np.ptp(y) > 0

    # reference one-file-per-tracer layout
    paths2 = sim.dump_traj(tmp_path / "traj_ref", per_tag_files=True)
    assert len(paths2) == n_tr
    trajs2 = iot.read_traj_dir(tmp_path / "traj_ref", "e_tracer")
    for tag in trajs:
        np.testing.assert_array_equal(trajs[tag], trajs2[tag])


def test_tracers_do_not_perturb_fields():
    """Tracers carry q=0: field evolution must be identical with and
    without them (the hijack_tracers guarantee)."""
    s_with = build(seed=5)
    s_without = build(tracer_stride=0, seed=5)
    s_with.advance(5)
    s_without.advance(5)
    for c in ("ex", "ey", "cbz"):
        np.testing.assert_array_equal(
            np.asarray(getattr(s_with.state.field, c)),
            np.asarray(getattr(s_without.state.field, c)), err_msg=c)


def test_collision_hook_isotropizes():
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from decks.collisions import make_pitch_angle_collisions

    n, nx = 4000, 8
    L = 1.0
    sim = Simulation(seed=11)
    sim.define_units(1.0, 1.0)
    dt = 0.9 * sim.courant_length(L, L, L, nx, nx, 1)
    sim.define_timestep(dt)
    sim.define_periodic_grid(0, 0, 0, L, L, L, nx, nx, 1)
    sim.define_material("vacuum")
    e = sim.define_species("electron", -1.0, 2 * n)
    sim.inject_particle(
        e, sim.uniform(n, 0, L), sim.uniform(n, 0, L), sim.uniform(n, 0, L),
        sim.maxwellian(n, 0.2), sim.maxwellian(n, 0.05),
        sim.maxwellian(n, 0.05), q=-1e-6 / n)  # nearly field-free
    sim.finalize(
        user_particle_collisions=make_pitch_angle_collisions(0.05 * 1.0))

    def aniso(s):
        sp = s.state.species[0]
        alive = np.asarray(sp.alive)
        ux2 = float(np.mean(np.asarray(sp.ux)[alive] ** 2))
        up2 = float(np.mean(np.asarray(sp.uy)[alive] ** 2
                            + np.asarray(sp.uz)[alive] ** 2)) / 2
        return ux2 / up2

    def ke(s):
        sp = s.state.species[0]
        alive = np.asarray(sp.alive)
        u2 = sum(np.asarray(getattr(sp, c), np.float64)[alive] ** 2
                 for c in ("ux", "uy", "uz"))
        return float(np.sum(u2))

    a0, k0 = aniso(sim), ke(sim)
    assert a0 > 5.0
    sim.advance(40)
    a1, k1 = aniso(sim), ke(sim)
    assert a1 < a0 * 0.5          # scattering isotropizes
    assert abs(k1 - k0) / k0 < 1e-3   # rotations conserve |u|


def test_global_header(tmp_path):
    sim = build(tracer_stride=0)
    path = sim.write_global_header(tmp_path / "global")
    text = path.read_text()
    assert "VPIC_HEADER_VERSION 1.0.0" in text
    assert "GRID_TOPOLOGY_X 1" in text
    assert "FIELD_DATA_VARIABLES 8" in text
    assert '"Electric Field" VECTOR 3 FLOATING_POINT 4' in text
    assert "NUM_OUTPUT_SPECIES 1" in text
    assert '"Stress Tensor" TENSOR 6 FLOATING_POINT 4' in text


def test_h5part_tracer_output(tmp_path):
    h5py = pytest.importorskip("h5py")
    sim = build()
    sim.collect_trajectories()
    for _ in range(3):
        sim.advance(1)
        sim.collect_trajectories()
    path = sim.dump_tracers_h5part(tmp_path / "tracers.h5part", "e_tracer")
    with h5py.File(path, "r") as f:
        steps = sorted(k for k in f.keys() if k.startswith("Step#"))
        assert len(steps) == 4
        g0 = f["Step#0"]
        for name in ("dX", "dY", "dZ", "i", "Ux", "Uy", "Uz", "q"):
            assert name in g0
        assert g0["dX"].shape == (10,)
        assert set(np.asarray(f["Step#3"]["q"])) == set(range(1, 11))
