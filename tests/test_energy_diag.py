"""KE band-distribution + log-spectrum diagnostics (energy.cxx analogue)
and the fan-run deck's buildability."""

import numpy as np

from vpic_tpu.core.types import Grid
from vpic_tpu.diag import energy_dist as ed


def test_band_dist_normalization_and_ghosts():
    g = Grid(nx=4, ny=3, nz=2)
    rng = np.random.default_rng(0)
    n = 500
    ux, uy, uz = (rng.normal(0, 0.3, n) for _ in range(3))
    x = rng.integers(1, g.nx + 1, n)
    y = rng.integers(1, g.ny + 1, n)
    z = rng.integers(1, g.nz + 1, n)
    cell = np.asarray(g.voxel(x, y, z))
    alive = np.ones(n, bool)
    nex, emax, vth = 8, 100.0, 0.3
    dist = ed.energy_band_dist(g, ux, uy, uz, cell, alive, nex, emax, vth)
    assert dist.shape == (nex, g.nv)
    tot = dist.sum(axis=0)
    # occupied interior cells normalize to 1
    occ = np.zeros(g.nv, bool)
    occ[cell] = True
    np.testing.assert_allclose(tot[occ], 1.0, rtol=1e-6)
    # the ghost cell adjacent to an interior cell copies it
    v_in = int(g.voxel(1, 1, 1))
    v_gh = int(g.voxel(0, 1, 1))
    np.testing.assert_array_equal(dist[:, v_gh], dist[:, v_in])

    # energy accounting: every particle lands in exactly one band
    # (overflow collapses into band nex-1, energy.cxx:103-105)
    raw_total = dist[:, occ].sum()
    assert raw_total > 0


def test_energy_spectrum_bins():
    rng = np.random.default_rng(1)
    n = 2000
    ux = rng.normal(0, 0.5, n)
    uy = rng.normal(0, 0.5, n)
    uz = rng.normal(0, 0.5, n)
    alive = np.ones(n, bool)
    edist = ed.energy_spectrum(ux, uy, uz, alive, vth=0.5)
    assert edist.shape == (800,)
    # nearly all particles have 1e-4 < ke < 1e4 -> captured by the bins
    assert edist.sum() >= 0.99 * n


def test_dump_and_read_roundtrip(tmp_path):
    g = Grid(nx=4, ny=3, nz=2)
    nex = 5
    dist = np.arange(nex * g.nv, dtype=np.float32).reshape(nex, g.nv)
    edist = np.arange(800, dtype=np.float32)
    ed.dump_energy_diag(tmp_path, 40, "electron", 0, dist, edist)
    d2, e2 = ed.read_energy_diag(tmp_path, 40, "electron", 0, nex, g.nv)
    np.testing.assert_array_equal(d2, dist)
    np.testing.assert_array_equal(e2, edist)


def test_fan_deck_builds_and_steps(monkeypatch, tmp_path):
    """The fan-run deck initializes (waves + drift load) and advances."""
    monkeypatch.setenv("FAN_NX", "8")
    monkeypatch.setenv("FAN_NY", "8")
    monkeypatch.setenv("FAN_NZ", "8")
    monkeypatch.setenv("FAN_PPC", "2")
    monkeypatch.setenv("FAN_STEPS", "2")
    import importlib
    import decks.turbulence_fan as fan
    importlib.reload(fan)
    sim = fan.deck()
    sim.finalize()
    e0 = sim.energies()
    assert all(np.isfinite(v) for v in e0.values())
    sim.advance(2)
    e1 = sim.energies()
    assert all(np.isfinite(v) for v in e1.values())
    # the wave fan put magnetic energy into bx/by
    assert e1["bx"] > 0 and e1["by"] > 0
    out = sim.dump_energy_diag("electron", tmp_path, nex=10, emax=100.0,
                               vth=0.1)
    assert out and all(p.exists() for pair in out for p in pair)


def test_turbulence_deck_builds_and_steps(monkeypatch, tmp_path):
    """The trecon turbulence deck (split top/bottom species + wave-seeded
    force-free sheet + conductive walls, turbulence.cxx analogue)
    initializes and advances with every mover serviced."""
    monkeypatch.setenv("TURB_NX", "16")
    monkeypatch.setenv("TURB_NY", "8")
    monkeypatch.setenv("TURB_NZ", "8")
    monkeypatch.setenv("TURB_PPC", "4")
    import importlib
    import decks.turbulence as turb
    importlib.reload(turb)
    sim = turb.deck()
    sim.finalize()
    tot0 = sum(sim.energies().values())
    sim.advance(10)
    e1 = sim.energies()
    assert all(np.isfinite(v) for v in e1.values())
    assert abs(sum(e1.values()) - tot0) / tot0 < 2e-2
    assert all(c == 0 for c in sim.mover_counts().values())
    # all four bulk species carry particles (top/bottom split)
    for sp in sim.state.species[:4]:
        assert int(np.asarray(sp.np)) > 0
    out = sim.dump_energy_diag("eT", tmp_path, nex=8, emax=50.0, vth=0.6)
    assert out and all(p.exists() for pair in out for p in pair)


def test_turbulence_deck_standard_inventory(monkeypatch, tmp_path):
    """A short flagship-deck run with the in-deck diagnostics() must
    reproduce the reference production inventory by default — rundata
    (grid/materials/species/energies) + global header, banded fields +
    hydro per species, particle dumps, rotating restart (turbulence.cxx
    begin_diagnostics, :1015-1247)."""
    monkeypatch.setenv("TURB_NX", "8")
    monkeypatch.setenv("TURB_NY", "8")
    monkeypatch.setenv("TURB_NZ", "8")
    monkeypatch.setenv("TURB_PPC", "2")
    monkeypatch.setenv("TURB_OUT", str(tmp_path))
    monkeypatch.setenv("TURB_ENERGY_INTERVAL", "2")
    monkeypatch.setenv("TURB_FIELD_INTERVAL", "2")
    monkeypatch.setenv("TURB_PARTICLE_INTERVAL", "4")
    monkeypatch.setenv("TURB_RESTART_INTERVAL", "4")
    monkeypatch.setenv("TURB_TRACER_INTERVAL", "4")
    import importlib

    import decks.turbulence as turb
    importlib.reload(turb)
    sim = turb.deck()
    sim.finalize()
    turb.diagnostics(sim)              # step 0: one-time rundata dumps
    for _ in range(4):
        sim.advance(1)
        turb.diagnostics(sim)
    for rel in ("rundata/grid.0", "rundata/materials", "rundata/species",
                "rundata/energies", "global.vpc",
                "fields/fields.2.0", "fields/fields.4.0",
                "hydro/eThydro.2.0", "hydro/iBhydro.4.0",
                "particle/eTparticle.4.0", "particle/iBparticle.4.0",
                "restart1/restart.json",
                "tracer/etracer.4.0", "tracer/itracer.4.0"):
        assert (tmp_path / rel).exists(), rel
