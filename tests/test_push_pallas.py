"""Fused Pallas push+walk kernel vs the XLA reference path (interpret mode
on CPU; the real kernel is exercised on TPU by bench/verify runs).

The XLA path (push.advance_p unfused) is itself parity-tested against the
NumPy transcription of the reference kernels (test_kernel_parity.py), so
fused == unfused here transitively pins the fused kernel to
advance_p.cxx/move_p.c semantics."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def _needs_cpu(test_name: str) -> bool:
    """Interpret-mode kernels are unusable over a remote-TPU tunnel (every
    interpreted op is a network round trip); re-run in a scrubbed local-CPU
    subprocess when the ambient backend is not cpu."""
    if jax.default_backend() == "cpu":
        return True
    if os.environ.get("VPIC_TPU_MESH_CHILD") == "1":
        pytest.skip("no cpu backend even in child")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["VPIC_TPU_MESH_CHILD"] = "1"
    r = subprocess.run(
        [sys.executable, "-m", "pytest", f"{__file__}::{test_name}",
         "-q", "--no-header"],
        env=env, capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, f"child failed:\n{r.stdout}\n{r.stderr}"
    return False

from vpic_tpu.core.types import (
    Grid,
    NEIGHBOR_ABSORB,
    NEIGHBOR_REFLECT,
    PERIODIC_FIELDS,
    SpeciesState,
)
from vpic_tpu.grid.partition import make_grid_arrays
from vpic_tpu.particles import push as ppush

NX, NY, NZ = 6, 5, 4
DT = 0.04


def mk(pbc=(PERIODIC_FIELDS,) * 6):
    g = Grid(nx=NX, ny=NY, nz=NZ, dt=DT, cvac=1.0, eps0=1.0,
             gx1=1.0, gy1=1.0, gz1=1.0,
             fbc=(PERIODIC_FIELDS,) * 6, pbc=pbc)
    rng = np.random.default_rng(7)
    interp = jnp.asarray(
        0.1 * rng.normal(size=(g.nv, 18)).astype(np.float32))
    return g, rng, interp


def mk_species(g, rng, n, max_np, hot):
    sp = SpeciesState.create("e", 0, -1.0, max_np)
    x = rng.integers(1, g.nx + 1, n)
    y = rng.integers(1, g.ny + 1, n)
    z = rng.integers(1, g.nz + 1, n)
    vox = np.asarray(g.voxel(x, y, z), np.int32)
    order = np.argsort(vox, kind="stable")
    ut = 3.0 if hot else 0.2
    pad = max_np - n

    def f32(a):
        return jnp.asarray(np.concatenate(
            [a[order], np.zeros(pad)]).astype(np.float32))

    return sp.replace(
        np=jnp.int32(n),
        dx=f32(rng.uniform(-1, 1, n)), dy=f32(rng.uniform(-1, 1, n)),
        dz=f32(rng.uniform(-1, 1, n)),
        i=jnp.asarray(np.concatenate(
            [vox[order], np.zeros(pad)]).astype(np.int32)),
        ux=f32(rng.normal(0, ut, n)), uy=f32(rng.normal(0, ut, n)),
        uz=f32(rng.normal(0, ut, n)),
        q=f32(rng.uniform(0.5, 1.5, n)),
    )


def test_fused_matches_unfused():
    if not _needs_cpu("test_fused_matches_unfused"):
        return
    for hot in (False, True):
        for pbc in ((PERIODIC_FIELDS,) * 6,
                    (NEIGHBOR_REFLECT, NEIGHBOR_ABSORB)
                    + (PERIODIC_FIELDS,) * 4):
            _check_fused_matches_unfused(hot, pbc)


def test_fused_rowloop_matches_unfused():
    """The (1,128)-row-loop kernel layout stays available as a
    fallback (wide=False); pin its semantics too."""
    if not _needs_cpu("test_fused_rowloop_matches_unfused"):
        return
    _check_fused_matches_unfused(True, (PERIODIC_FIELDS,) * 6,
                                 wide=False)


def _check_fused_matches_unfused(hot, pbc, wide=True):
    g, rng, interp = mk(pbc)
    ga = make_grid_arrays(g)
    n, max_np = 300, 512
    sp = mk_species(g, rng, n, max_np, hot)

    acc0 = jnp.zeros((g.nv, 12), jnp.float32)
    KO = dict(block=256, window=256, pre=64, wide=wide)
    sp_ref, acc_ref = jax.jit(
        lambda sp, acc: ppush.advance_p(sp, interp, acc, ga.neighbor, g,
                                        n_walk=4, fused=False,
                                        max_nm=max_np))(sp, acc0)

    with pltpu.force_tpu_interpret_mode():
        sp_f, acc_f = jax.jit(
            lambda sp, acc: ppush.advance_p(sp, interp, acc, ga.neighbor, g,
                                            n_walk=4, fused=True,
                                            kernel_opts=KO))(sp, acc0)

    live = np.asarray(sp.alive)
    assert int(sp_f.nm) == int(sp_ref.nm)
    np.testing.assert_array_equal(np.asarray(sp_f.i)[live],
                                  np.asarray(sp_ref.i)[live])
    np.testing.assert_array_equal(np.asarray(sp_f.pc)[live],
                                  np.asarray(sp_ref.pc)[live])
    for c in ("ux", "uy", "uz"):
        np.testing.assert_allclose(
            np.asarray(getattr(sp_f, c))[live],
            np.asarray(getattr(sp_ref, c))[live],
            rtol=1e-5, atol=1e-6, err_msg=c)
    for c in ("dx", "dy", "dz", "mdx", "mdy", "mdz"):
        np.testing.assert_allclose(
            np.asarray(getattr(sp_f, c))[live],
            np.asarray(getattr(sp_ref, c))[live],
            rtol=1e-4, atol=2e-5, err_msg=c)
    np.testing.assert_allclose(np.asarray(acc_f), np.asarray(acc_ref),
                               rtol=1e-4, atol=2e-5)


def test_fused_perblock_slabs_match():
    """The large-grid per-block deposit-slab mode (+ combine epilogue)
    must reproduce the resident-accumulator results exactly."""
    if not _needs_cpu("test_fused_perblock_slabs_match"):
        return
    for hot in (False, True):
        g, rng, interp = mk()
        ga = make_grid_arrays(g)
        n, max_np = 300, 512
        sp = mk_species(g, rng, n, max_np, hot)
        acc0 = jnp.zeros((g.nv, 12), jnp.float32)
        KO = dict(block=256, window=256, pre=64)
        with pltpu.force_tpu_interpret_mode():
            sp_a, acc_a = jax.jit(
                lambda sp, acc: ppush.advance_p(
                    sp, interp, acc, ga.neighbor, g, n_walk=4, fused=True,
                    kernel_opts=dict(KO, perblock=False)))(sp, acc0)
            sp_b, acc_b = jax.jit(
                lambda sp, acc: ppush.advance_p(
                    sp, interp, acc, ga.neighbor, g, n_walk=4, fused=True,
                    kernel_opts=dict(KO, perblock=True)))(sp, acc0)
        live = np.asarray(sp.alive)
        for c in ("dx", "dy", "dz", "ux", "uy", "uz", "i", "pc"):
            np.testing.assert_array_equal(
                np.asarray(getattr(sp_b, c))[live],
                np.asarray(getattr(sp_a, c))[live], err_msg=c)
        np.testing.assert_allclose(np.asarray(acc_b), np.asarray(acc_a),
                                   rtol=1e-6, atol=1e-7)


def test_fused_tiled_layout_matches():
    """The tiled-x kernel layout (large-grid mode) must match the unfused
    reference exactly.  On a tiny grid (nxg < TILE) tiled ordering equals
    voxel ordering, so the standard harness applies."""
    if not _needs_cpu("test_fused_tiled_layout_matches"):
        return
    from vpic_tpu.particles import push_pallas as pk

    orig = pk.use_tiled
    pk.use_tiled = lambda g: True
    try:
        for pbc in ((PERIODIC_FIELDS,) * 6,
                    (NEIGHBOR_REFLECT, NEIGHBOR_ABSORB)
                    + (PERIODIC_FIELDS,) * 4):
            _check_fused_matches_unfused(False, pbc)
    finally:
        pk.use_tiled = orig


def test_fused_xy_tiled_layout_matches():
    """The xy-tiled 3D kernel layout (z-crossings at +-128, xy in one
    (tx x ty) lane tile, seam crossings exported) must match the unfused
    reference.  The tiny grid fits one tile, so seams coincide with the
    domain faces; a second pass with (4, 32) forces interior x seams."""
    if not _needs_cpu("test_fused_xy_tiled_layout_matches"):
        return
    from vpic_tpu.particles import push_pallas as pk

    orig_use, orig_shape = pk.use_tiled, pk.tile_shape
    for shape in ((16, 8), (4, 32)):
        pk.use_tiled = lambda g: True
        pk.tile_shape = lambda g, s=shape: s
        try:
            for pbc in ((PERIODIC_FIELDS,) * 6,
                        (NEIGHBOR_REFLECT, NEIGHBOR_ABSORB)
                        + (PERIODIC_FIELDS,) * 4):
                _check_fused_matches_unfused(False, pbc)
        finally:
            pk.use_tiled, pk.tile_shape = orig_use, orig_shape


def test_fused_unsorted_redo_path():
    """Badly unsorted particles exercise the out-of-window redo path."""
    if not _needs_cpu("test_fused_unsorted_redo_path"):
        return
    g, rng, interp = mk()
    ga = make_grid_arrays(g)
    n, max_np = 300, 512
    sp = mk_species(g, rng, n, max_np, hot=False)
    perm = rng.permutation(max_np)
    sp = sp.replace(**{k: getattr(sp, k)[perm]
                       for k in ("dx", "dy", "dz", "i", "ux", "uy", "uz",
                                 "q")})
    # rebuild a contiguous live set: alive depends on slot < np, so mark
    # every slot live by charge instead
    keep = perm < n
    sp = sp.replace(np=jnp.int32(max_np),
                    q=jnp.where(jnp.asarray(keep), sp.q, 0.0),
                    i=jnp.where(jnp.asarray(keep), sp.i, 0))

    acc0 = jnp.zeros((g.nv, 12), jnp.float32)
    KO = dict(block=256, window=256, pre=64)
    sp_ref, acc_ref = jax.jit(
        lambda sp, acc: ppush.advance_p(sp, interp, acc, ga.neighbor, g,
                                        n_walk=4, fused=False,
                                        max_nm=max_np))(sp, acc0)
    with pltpu.force_tpu_interpret_mode():
        sp_f, acc_f = jax.jit(
            lambda sp, acc: ppush.advance_p(sp, interp, acc, ga.neighbor, g,
                                            n_walk=4, fused=True,
                                            kernel_opts=KO))(sp, acc0)

    live = np.asarray(keep)
    np.testing.assert_array_equal(np.asarray(sp_f.i)[live],
                                  np.asarray(sp_ref.i)[live])
    for c in ("dx", "dy", "dz", "ux", "uy", "uz"):
        np.testing.assert_allclose(
            np.asarray(getattr(sp_f, c))[live],
            np.asarray(getattr(sp_ref, c))[live],
            rtol=1e-4, atol=2e-5, err_msg=c)
    np.testing.assert_allclose(np.asarray(acc_f), np.asarray(acc_ref),
                               rtol=1e-4, atol=2e-5)


def test_fused_tolerates_multistep_sort_drift():
    """Per-species sort cadence lets a species go many steps between
    sorts; the fused kernel must keep matching the unfused path while
    the voxel order drifts (window pre-bias + out-of-window fix-up +
    exports).  Runs 6 consecutive steps from one sorted state with NO
    re-sorting on either path."""
    if not _needs_cpu("test_fused_tolerates_multistep_sort_drift"):
        return
    g, rng, interp = mk()
    ga = make_grid_arrays(g)
    n, max_np = 300, 512
    sp0 = mk_species(g, rng, n, max_np, hot=True)

    KO = dict(block=256, window=256, pre=64, wide=True)
    step_ref = jax.jit(lambda sp: ppush.advance_p(
        sp, interp, jnp.zeros((g.nv, 12), jnp.float32), ga.neighbor, g,
        n_walk=4, fused=False, max_nm=max_np))
    step_f = jax.jit(lambda sp: ppush.advance_p(
        sp, interp, jnp.zeros((g.nv, 12), jnp.float32), ga.neighbor, g,
        n_walk=4, fused=True, kernel_opts=KO, fix_cap=max_np))

    sp_r, sp_f = sp0, sp0
    live = np.asarray(sp0.alive)
    for step in range(6):
        sp_r, acc_r = step_ref(sp_r)
        # movers must be cleared between steps (finish_boundary's job;
        # these tests run the bare kernel, so emulate a settled state)
        sp_r = sp_r.replace(pc=jnp.zeros_like(sp_r.pc),
                            mdx=jnp.zeros_like(sp_r.mdx),
                            mdy=jnp.zeros_like(sp_r.mdy),
                            mdz=jnp.zeros_like(sp_r.mdz),
                            nm=jnp.int32(0))
        with pltpu.force_tpu_interpret_mode():
            sp_f, acc_f = step_f(sp_f)
        sp_f = sp_f.replace(pc=jnp.zeros_like(sp_f.pc),
                            mdx=jnp.zeros_like(sp_f.mdx),
                            mdy=jnp.zeros_like(sp_f.mdy),
                            mdz=jnp.zeros_like(sp_f.mdz),
                            nm=jnp.int32(0))
        np.testing.assert_array_equal(
            np.asarray(sp_f.i)[live], np.asarray(sp_r.i)[live],
            err_msg=f"vox step {step}")
        for c in ("dx", "dy", "dz", "ux", "uy", "uz"):
            np.testing.assert_allclose(
                np.asarray(getattr(sp_f, c))[live],
                np.asarray(getattr(sp_r, c))[live],
                rtol=2e-4, atol=5e-5, err_msg=f"{c} step {step}")
        np.testing.assert_allclose(np.asarray(acc_f), np.asarray(acc_r),
                                   rtol=2e-4, atol=5e-5,
                                   err_msg=f"acc step {step}")


def test_packed_cycle_matches_unpacked(monkeypatch=None):
    """The packed-cycle fast path (PackedSpecies riding the kernel's
    (8,n) block between steps) must reproduce the unpacked fused cycle:
    same positions/momenta/voxels and energies after several full
    resort cycles through the public Simulation API."""
    if not _needs_cpu("test_packed_cycle_matches_unpacked"):
        return
    from jax.experimental.pallas import tpu as pltpu2

    os.environ["VPIC_TPU_FORCE_FUSED"] = "1"
    os.environ.pop("VPIC_TPU_DISABLE_PALLAS", None)
    try:
        import __graft_entry__ as ge

        def build():
            return ge._build(nx=8, ny=8, nz=1, npart=1500,
                             ion_sort_mult=2)

        with pltpu2.force_tpu_interpret_mode():
            os.environ["VPIC_TPU_DISABLE_PACKED"] = "1"
            simA = build()
            assert simA._cycle_body_packed is None
            simA.advance(8)
            eA = simA.energies()

            os.environ.pop("VPIC_TPU_DISABLE_PACKED", None)
            simB = build()
            assert simB._cycle_body_packed is not None
            simB.advance(8)
            eB = simB.energies()

        for k in eA:
            np.testing.assert_allclose(float(eB[k]), float(eA[k]),
                                       rtol=2e-5, atol=1e-12, err_msg=k)
        for a, b in zip(simA.state.species, simB.state.species):
            la = np.asarray(a.alive)
            # same live set; the packed path sorts identically (stable,
            # same keys) so slots line up
            np.testing.assert_array_equal(np.asarray(a.i)[la],
                                          np.asarray(b.i)[la])
            for c in ("dx", "dy", "dz", "ux", "uy", "uz", "q"):
                np.testing.assert_allclose(
                    np.asarray(getattr(a, c))[la],
                    np.asarray(getattr(b, c))[la],
                    rtol=2e-5, atol=1e-7, err_msg=f"{a.name}.{c}")
    finally:
        os.environ.pop("VPIC_TPU_FORCE_FUSED", None)
        os.environ.pop("VPIC_TPU_DISABLE_PACKED", None)
        os.environ["VPIC_TPU_DISABLE_PALLAS"] = "1"


@pytest.mark.parametrize("n_walk", [None, 2])
def test_closed_deck_drops_no_movers(n_walk):
    """A closed periodic deck on the fused+packed bench path must process
    EVERY mover: sp.nm == 0 after full super-cycles and np conserved.
    Guards against 'drop-assisted' perf regressions — the round-3
    n_walk=2 +14% was drop-assisted (fix-up overflow), and the round-4
    diagnosis found the default path dropping too (wrap-outlier start
    poison + sparse-buffer windows, NOTES_ROUND4.md).  This invariant is
    what the reference WARNs about (advance.cxx:98-103) and a closed box
    must keep at zero — including at n_walk=2, where every double-
    crosser rides the fix-up."""
    if not _needs_cpu(f"test_closed_deck_drops_no_movers[{n_walk}]"):
        return
    from jax.experimental.pallas import tpu as pltpu2

    os.environ["VPIC_TPU_FORCE_FUSED"] = "1"
    os.environ.pop("VPIC_TPU_DISABLE_PALLAS", None)
    try:
        import __graft_entry__ as ge

        with pltpu2.force_tpu_interpret_mode():
            sim = ge._build(nx=8, ny=8, nz=1, npart=1500, ion_sort_mult=2,
                            n_walk=n_walk)
            np0 = sum(int(np.asarray(sp.np)) for sp in sim.state.species)
            sim.advance(8)          # 2 super-cycles (resort 2 x mult 2)
            for sp in sim.state.species:
                assert int(np.asarray(sp.nm)) == 0, sp.name
            np1 = sum(int(np.asarray(sp.np)) for sp in sim.state.species)
            assert np1 == np0
            assert all(np.isfinite(v) for v in sim.energies().values())
    finally:
        os.environ.pop("VPIC_TPU_FORCE_FUSED", None)
        os.environ["VPIC_TPU_DISABLE_PALLAS"] = "1"


def test_closed_deck_drops_no_movers_3d_xy_tiled():
    """Same invariant on an nz>1 deck that takes the (16, 8) xy-tiled
    kernel layout (step.py sizes fix_cap for its tile-seam exports with a
    static frac=48 heuristic — this pins that the provisioning actually
    holds on a closed 3D box)."""
    if not _needs_cpu("test_closed_deck_drops_no_movers_3d_xy_tiled"):
        return
    from jax.experimental.pallas import tpu as pltpu2

    os.environ["VPIC_TPU_FORCE_FUSED"] = "1"
    os.environ.pop("VPIC_TPU_DISABLE_PALLAS", None)
    try:
        import __graft_entry__ as ge
        from vpic_tpu.particles import push_pallas as pk

        with pltpu2.force_tpu_interpret_mode():
            sim = ge._build(nx=16, ny=16, nz=8, npart=1500,
                            ion_sort_mult=2)
            g = sim.grid
            assert pk.use_tiled(g) and pk.tile_shape(g) == (16, 8)
            np0 = sum(int(np.asarray(sp.np)) for sp in sim.state.species)
            sim.advance(8)          # 2 super-cycles (resort 2 x mult 2)
            for sp in sim.state.species:
                assert int(np.asarray(sp.nm)) == 0, sp.name
            np1 = sum(int(np.asarray(sp.np)) for sp in sim.state.species)
            assert np1 == np0
            assert all(np.isfinite(v) for v in sim.energies().values())
    finally:
        os.environ.pop("VPIC_TPU_FORCE_FUSED", None)
        os.environ["VPIC_TPU_DISABLE_PALLAS"] = "1"


def test_compact_indices_hier_matches_flat():
    """The gather/rank-select hierarchical compaction must reproduce the
    flat prefix-sum compaction (same stable index order, count, and
    validity) across sparsity regimes, including k-overflow and the
    all-empty mask."""
    from vpic_tpu.particles.push import compact_indices, compact_indices_hier

    rng = np.random.default_rng(7)
    n = 4096
    for dens, k in ((0.0, 64), (0.001, 64), (0.02, 64), (0.02, 8),
                    (0.5, 256), (1.0, 128)):
        mask = jnp.asarray(rng.random(n) < dens)
        sel_f, n_f, val_f = compact_indices(mask, k, n)
        sel_h, n_h, val_h = compact_indices_hier(mask, k, n)
        np.testing.assert_array_equal(np.asarray(val_h), np.asarray(val_f),
                                      err_msg=f"valid dens={dens} k={k}")
        assert int(n_h) == int(n_f), (dens, k)
        vf = np.asarray(val_f)
        np.testing.assert_array_equal(np.asarray(sel_h)[vf],
                                      np.asarray(sel_f)[vf],
                                      err_msg=f"sel dens={dens} k={k}")


def test_compact_indices_hier_row_cap_drop():
    """Lanes beyond row_cap rows are dropped from sel but still counted in
    n_true (callers charge them against the mover-drop counter)."""
    from vpic_tpu.particles.push import compact_indices_hier

    n = 1024
    mask = np.zeros(n, bool)
    mask[5] = mask[200] = mask[300] = mask[900] = True
    sel, n_true, valid = compact_indices_hier(jnp.asarray(mask), 8, n,
                                              row_cap=2)
    assert int(n_true) == 4
    got = sorted(int(s) for s, v in zip(np.asarray(sel), np.asarray(valid))
                 if v)
    assert got == [5, 200]          # rows 0 and 1 (first two hit rows)
