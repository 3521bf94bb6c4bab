"""Dump formats (V0 binary golden round-trip) and checkpoint/restore."""

import numpy as np
import pytest

import jax

from tests.test_smoke import make_warm_plasma

from vpic_tpu.io import dump as iodump


def test_field_dump_roundtrip(tmp_path):
    sim = make_warm_plasma(nx=6, ny=5, nz=4, npart=256)
    sim.advance(2)
    base = tmp_path / "fields"
    sim.dump_fields(str(base))
    g = sim.grid
    path = f"{base}.{sim.step_count}.0"
    with open(path, "rb") as f:
        hdr = iodump.read_header_v0(f)
        assert hdr["magic_s"] == 0xCAFE
        assert hdr["magic_i"] == 0xDEADBEEF
        assert hdr["dump_type"] == iodump.FIELD_DUMP
        assert (hdr["nx"], hdr["ny"], hdr["nz"]) == (g.nx, g.ny, g.nz)
        elem, dims = iodump.read_array_header(f)
        assert elem == 80 and dims == (g.nxg, g.nyg, g.nzg)
        rec = np.frombuffer(f.read(), dtype=np.dtype(
            [("f", "<f4", 16), ("m", "<u2", 8)]))
    assert rec.shape[0] == g.nv
    np.testing.assert_array_equal(
        rec["f"][:, 0], np.asarray(sim.state.field.ex).reshape(-1))


def test_particle_dump(tmp_path):
    sim = make_warm_plasma(nx=4, ny=4, nz=4, npart=512)
    sim.advance(1)
    base = tmp_path / "parts"
    sim.dump_particles("electron", str(base))
    with open(f"{base}.{sim.step_count}.0", "rb") as f:
        hdr = iodump.read_header_v0(f)
        assert hdr["dump_type"] == iodump.PARTICLE_DUMP
        assert hdr["sp_id"] == 0
        elem, dims = iodump.read_array_header(f)
        assert elem == 32
        rec = np.frombuffer(f.read(), dtype=np.dtype(
            [("dx", "<f4"), ("dy", "<f4"), ("dz", "<f4"), ("i", "<i4"),
             ("ux", "<f4"), ("uy", "<f4"), ("uz", "<f4"), ("q", "<f4")]))
    assert rec.shape[0] == dims[0] == 512
    assert np.all(np.abs(rec["dx"]) <= 1.0 + 1e-6)
    assert np.all(rec["q"] != 0)


def test_hydro_dump(tmp_path):
    sim = make_warm_plasma(nx=4, ny=4, nz=4, npart=512)
    sim.advance(1)
    base = tmp_path / "hydro"
    sim.dump_hydro("electron", str(base))
    g = sim.grid
    with open(f"{base}.{sim.step_count}.0", "rb") as f:
        hdr = iodump.read_header_v0(f)
        assert hdr["dump_type"] == iodump.HYDRO_DUMP
        elem, dims = iodump.read_array_header(f)
        assert elem == 64
        arr = np.frombuffer(f.read(), "<f4").reshape(g.nv, 16)
    # total charge density integrates to the species charge
    rho = arr[:, 3].reshape(g.nzg, g.nyg, g.nxg)
    total = rho[1:g.nz + 1, 1:g.ny + 1, 1:g.nx + 1].sum() \
        * g.dx * g.dy * g.dz
    np.testing.assert_allclose(total, -1.0, rtol=1e-3)


def test_species_materials_ascii(tmp_path):
    sim = make_warm_plasma(nx=4, ny=4, nz=4, npart=128)
    spf = tmp_path / "species.txt"
    mtf = tmp_path / "materials.txt"
    sim.dump_species(str(spf))
    sim.dump_materials(str(mtf))
    lines = spf.read_text().splitlines()
    # one name\nid\nq_m stanza per species (dump.cxx:98-99)
    assert len(lines) == 3 * len(sim._species)
    assert lines[0] == "electron"
    assert int(lines[1]) == 0
    assert float(lines[2]) == pytest.approx(-1.0)
    mlines = mtf.read_text().splitlines()
    # name, id, then 3 rows of 3 (dump.cxx:114-118)
    assert len(mlines) == 5 * len(sim.materials)
    assert mlines[0] == sim.materials[0].name
    row = [float(v) for v in mlines[2].split()]
    assert row == pytest.approx([sim.materials[0].epsx,
                                 sim.materials[0].epsy,
                                 sim.materials[0].epsz])


def test_standard_diagnostics_inventory(tmp_path):
    """The reusable begin_diagnostics orchestration must produce the
    trecon rundata layout (turbulence.cxx:1015-1247): rundata/{grid,
    materials,species,energies}, global header, cadenced banded field +
    hydro dumps, particle dumps, rotating restart slots."""
    sim = make_warm_plasma(nx=4, ny=4, nz=4, npart=256)
    diag = sim.standard_diagnostics(
        tmp_path, energies_interval=2, fields_interval=2,
        particle_interval=4, particle_species=("electron",),
        restart_interval=4)
    assert diag()                       # step 0: one-time dumps
    for _ in range(4):
        sim.advance(1)
        assert diag()
    for rel in ("rundata/grid.0", "rundata/materials",
                "rundata/species", "rundata/energies", "global.vpc",
                "fields/fields.2.0", "fields/fields.4.0",
                "hydro/electronhydro.2.0", "hydro/electronhydro.4.0",
                "particle/electronparticle.4.0",
                "restart1/restart.json"):
        assert (tmp_path / rel).exists(), rel
    # energies appended one row per cadence hit (steps 0, 2, 4 + header)
    rows = [ln for ln in (tmp_path / "rundata/energies").read_text()
            .splitlines() if ln and not ln.startswith("%")]
    assert len(rows) == 3


def test_energies_file(tmp_path):
    sim = make_warm_plasma(nx=4, ny=4, nz=4, npart=128)
    fn = tmp_path / "energies.txt"
    sim.dump_energies(str(fn), append=False)
    sim.advance(2)
    sim.dump_energies(str(fn))
    lines = fn.read_text().splitlines()
    assert lines[0].startswith("%% Layout")
    assert "electron" in lines[1]
    data = [l for l in lines if not l.startswith("%")]
    assert len(data) == 2
    assert len(data[0].split()) == 1 + 6 + 1


def test_checkpoint_restore_determinism(tmp_path):
    sim = make_warm_plasma(nx=6, ny=6, nz=1, npart=512, seed=5)
    sim.advance(3)
    sim.checkpoint(tmp_path / "ck")

    sim.advance(4)
    ref = {c: np.asarray(getattr(sim.state.field, c))
           for c in ("ex", "ey", "cbz")}
    ref_p = np.asarray(sim.state.species[0].ux)

    sim2 = make_warm_plasma(nx=6, ny=6, nz=1, npart=512, seed=5)
    sim2.restore(tmp_path / "ck")
    assert sim2.step_count == 3
    sim2.advance(4)
    for c, v in ref.items():
        np.testing.assert_array_equal(
            np.asarray(getattr(sim2.state.field, c)), v, err_msg=c)
    np.testing.assert_array_equal(np.asarray(sim2.state.species[0].ux),
                                  ref_p)


def test_checkpoint_pads_unaligned_capacity(tmp_path):
    """A checkpoint whose particle columns were saved at a smaller
    (pre-1024-alignment) capacity restores into the aligned template:
    1-D leaves are zero-padded at the tail (dead slots are q=0/i=0 by
    contract), everything else must match exactly."""
    sim = make_warm_plasma(nx=6, ny=6, nz=1, npart=256, seed=5)
    sim.advance(2)
    sim.checkpoint(tmp_path / "ck")

    # simulate an old-format file: truncate every full-capacity 1-D leaf
    # to an unaligned length that still covers the live range
    path = str(tmp_path / "ck") + ".npz"
    data = dict(np.load(path))
    max_np = sim.state.species[0].max_np
    assert max_np % 1024 == 0
    short = max(300, int(np.asarray(sim.state.species[0].np)))
    for k, v in data.items():
        if v.ndim == 1 and v.shape[0] == max_np:
            data[k] = v[:short]
    np.savez(path, **data)

    sim.advance(3)
    ref = {c: np.asarray(getattr(sim.state.field, c))
           for c in ("ex", "ey", "cbz")}

    sim2 = make_warm_plasma(nx=6, ny=6, nz=1, npart=256, seed=5)
    sim2.restore(tmp_path / "ck")
    sim2.advance(3)
    for c, v in ref.items():
        np.testing.assert_array_equal(
            np.asarray(getattr(sim2.state.field, c)), v, err_msg=c)


def test_checkpoint_rejects_shape_mismatch(tmp_path):
    """Non-repairable shape mismatches fail loudly (the reference restart
    reader ABORTs on every size/dim mismatch, dump.cxx:566-797), not as
    an obscure downstream shape error."""
    import pytest

    sim = make_warm_plasma(nx=6, ny=6, nz=1, npart=64, seed=1)
    sim.checkpoint(tmp_path / "ck")

    path = str(tmp_path / "ck") + ".npz"
    data = dict(np.load(path))
    for k, v in data.items():
        if v.ndim == 3:                     # a field component
            data[k] = v[:-1]
            break
    np.savez(path, **data)

    sim2 = make_warm_plasma(nx=6, ny=6, nz=1, npart=64, seed=1)
    with pytest.raises(ValueError, match="shape"):
        sim2.restore(tmp_path / "ck")


def test_rotating_checkpointer(tmp_path):
    from vpic_tpu.io.checkpoint import RotatingCheckpointer

    sim = make_warm_plasma(nx=4, ny=4, nz=1, npart=64)
    rc = RotatingCheckpointer(tmp_path, quota_hours=1e9)
    rc.save(sim.state, sim.grid)
    rc.save(sim.state, sim.grid)
    rc.save(sim.state, sim.grid)
    assert rc.latest() is not None
    assert not rc.over_quota()
