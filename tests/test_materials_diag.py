"""Material regions (conductive damping), banded dumps, readers,
checksums, phase-diagnostic helpers."""

import numpy as np
import pytest

from vpic_tpu.deck.api import Simulation
from vpic_tpu.io.banded import DumpParameters, field_dump, read_banded
from vpic_tpu.io import readers


def wave_box(conductor=False, nx=16, seed=4):
    sim = Simulation(seed=seed)
    sim.define_units(1.0, 1.0)
    L = 1.0
    sim.define_timestep(0.6 * sim.courant_length(L, L, L, nx, nx, 1))
    sim.define_periodic_grid(0, 0, 0, L, L, L, nx, nx, 1)
    sim.define_material("vacuum")
    if conductor:
        copper = sim.define_material("copper", eps=1.0, sigma=5.0)
        sim.set_region_material(lambda x, y, z: x > 0.5, copper)
    sim.set_field("ey", lambda x, y, z: 0.1 * np.sin(2 * np.pi * x))
    sim.set_field("cbz", lambda x, y, z: 0.1 * np.sin(2 * np.pi * x))
    sim.finalize()
    return sim


def test_conductive_material_damps_wave():
    v = wave_box(conductor=False)
    c = wave_box(conductor=True)
    assert c.state.material_grid is not None
    v.advance(20)
    c.advance(20)
    ev = sum(v.energies()[k] for k in ("ex", "ey", "ez"))
    ec = sum(c.energies()[k] for k in ("ex", "ey", "ez"))
    # the conductive half dissipates wave energy (a standing wave keeps
    # feeding E back from B, so the drop is partial but clear)
    assert ec < 0.75 * ev
    assert np.isfinite(ec)


def test_banded_dump_roundtrip(tmp_path):
    sim = wave_box()
    sim.advance(2)
    dp = DumpParameters(stride_x=2, stride_y=2,
                        select=("ey", "cbz"), format=0)
    p = field_dump(sim.state, sim.grid, tmp_path / "banded.0", dp,
                   sim.step_count)
    hdr, out, meta = read_banded(p)
    assert set(out) == {"ey", "cbz"}
    g = sim.grid
    ref = np.asarray(sim.state.field.ey)[1:g.nz + 1, 1:g.ny + 1:2,
                                         1:g.nx + 1:2]
    np.testing.assert_array_equal(out["ey"], ref)
    assert meta["strides"] == (2, 2, 1)


def test_readers_roundtrip(tmp_path):
    from tests.test_smoke import make_warm_plasma

    sim = make_warm_plasma(nx=4, ny=4, nz=4, npart=128)
    sim.advance(1)
    sim.dump_fields(str(tmp_path / "f"))
    sim.dump_particles("electron", str(tmp_path / "p"))
    hdr, flds = readers.read_fields(f"{tmp_path}/f.{sim.step_count}.0")
    np.testing.assert_array_equal(flds["ex"],
                                  np.asarray(sim.state.field.ex))
    hdr, rec, pos = readers.read_particles(
        f"{tmp_path}/p.{sim.step_count}.0")
    assert pos.shape == (128, 3)
    assert np.all(pos >= -1e-6) and np.all(pos <= 1.0 + 1e-6)


def test_checksums_change_and_reproduce():
    from tests.test_smoke import make_warm_plasma

    a = make_warm_plasma(nx=4, ny=4, nz=1, npart=64, seed=9)
    b = make_warm_plasma(nx=4, ny=4, nz=1, npart=64, seed=9)
    assert a.checksum_fields() == b.checksum_fields()
    assert a.checksum_species("electron") == b.checksum_species("electron")
    c0 = a.checksum_fields()
    a.advance(2)
    assert a.checksum_fields() != c0
    b.advance(2)
    assert a.checksum_fields() == b.checksum_fields()
    assert a.checksum_species("electron") == b.checksum_species("electron")
