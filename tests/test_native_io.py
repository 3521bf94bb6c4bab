"""Native (C++) dump toolchain vs the pure-Python readers: V0 header
parse, bulk particle reads, and multi-rank banded joining."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from vpic_tpu import Simulation
from vpic_tpu.io import banded as iob
from vpic_tpu.io import dump as iodump
from vpic_tpu.io import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def build(px=1):
    nx, ny, nz = 8, 6, 1
    L = 1.0
    sim = Simulation(seed=4)
    sim.define_units(1.0, 1.0)
    sim.define_timestep(0.9 * sim.courant_length(L, L, L, nx, ny, nz))
    sim.define_periodic_grid(0, 0, 0, L, L, L, nx, ny, nz, px, 1, 1)
    sim.define_material("vacuum")
    e = sim.define_species("electron", -1.0, 2048)
    n = 512
    sim.inject_particle(e, sim.uniform(n, 0, L), sim.uniform(n, 0, L),
                        sim.uniform(n, 0, L), sim.maxwellian(n, 0.2),
                        sim.maxwellian(n, 0.2), sim.maxwellian(n, 0.2),
                        q=-1.0 / n)
    sim.set_field("ex", lambda x, y, z: np.sin(2 * np.pi * x) + y)
    sim.finalize()
    sim.advance(2)
    return sim


def test_native_header_and_particles(tmp_path):
    sim = build()
    sim.dump_particles("electron", str(tmp_path / "p"))
    path = tmp_path / f"p.{sim.step_count}.0"

    hdr = native.read_header(path)
    assert hdr["dump_type"] == iodump.PARTICLE_DUMP
    assert hdr["step"] == sim.step_count
    assert (hdr["nx"], hdr["ny"], hdr["nz"]) == (8, 6, 1)
    assert hdr["elem_size"] == 32

    rec = native.read_particles(path)
    assert rec.shape == (512, 8)
    # cross-check with a direct numpy read
    with open(path, "rb") as f:
        iodump.read_header_v0(f)
        iodump.read_array_header(f)
        ref = np.fromfile(f, "<f4").reshape(-1, 8)
    np.testing.assert_array_equal(rec, ref)

    # CLI smoke
    out = subprocess.run(
        [str(Path(native._NATIVE_DIR) / "vpic_dump"), "info", str(path)],
        capture_output=True, text=True, check=True)
    assert "type=particle" in out.stdout
    assert "elem=32B" in out.stdout


def test_native_banded_join(tmp_path):
    sim = build(px=2)
    g = sim.grid
    dp = iob.DumpParameters(select=("ex", "cbz", "rhof"))
    paths = []
    for shard, rank, st in sim._shard_states():
        p = tmp_path / f"f.{rank}"
        iob.field_dump(st, g, p, dp, sim.step_count, shard, rank, 2)
        paths.append(p)

    nvars = native.join_banded(paths, 2, 1, 1, tmp_path / "joined.bin")
    assert nvars == 3
    joined = np.fromfile(tmp_path / "joined.bin", "<f4").reshape(
        3, g.nz, g.ny, 2 * g.nx)

    # python reference join
    for k, name in enumerate(("ex", "cbz", "rhof")):
        blocks = [iob.read_banded(p)[1][name] for p in paths]
        ref = np.concatenate(blocks, axis=2)
        np.testing.assert_array_equal(joined[k], ref, err_msg=name)

    # the joined ex brick must be continuous across the shard seam
    ex = joined[0][0]  # (ny, 2*nx)
    seam_jump = np.abs(np.diff(ex, axis=1))[:, g.nx - 1]
    interior_jump = np.abs(np.diff(ex, axis=1)).mean()
    assert seam_jump.mean() < 10 * interior_jump + 1.0
