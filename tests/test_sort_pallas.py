"""merge_sort_packed: the O(n) near-sorted re-sort (the TPU answer to the
reference's counting sort, src/species_advance/standard/sort_p.c:16-102).

The contract under test: given a packed (8, n) block whose keys are a
small perturbation of the previous sort's order (carried as key0/ctot),
the merge re-sort must produce exactly the multiset-preserving sorted
order the bitonic would (dead tail at the end, row 7 zeroed past np),
with anomaly == 0 on the fast path and a bit-correct slow-path fallback
whenever provisioning is defeated."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpic_tpu.particles import sort_pallas as sps

# small-geometry kernel parameters for interpret-mode runs
KW = dict(m_cap=256, B=128, W=128, win_r=512, interpret=True)


def _mk_sorted(rng, n, np_, nvk):
    """A freshly-sorted packed block + its key0/ctot tables."""
    key = np.sort(rng.integers(0, nvk, size=np_)).astype(np.int32)
    rows = rng.standard_normal((7, np_)).astype(np.float32)
    pk = np.zeros((8, n), np.float32)
    pk[:7, :np_] = rows
    pk[7, :np_] = key.astype(np.float32)
    key0 = np.full((n,), nvk, np.int32)
    key0[:np_] = key
    full = np.concatenate([key, np.full((n - np_,), nvk, np.int32)])
    v = np.arange(nvk + 3, dtype=np.int32)
    ctot = np.searchsorted(full, v, side="left").astype(np.int32)
    return pk, key0, ctot


def _perturb(rng, pk, np_, nvk, frac=0.03, far_frac=0.002):
    """Move a fraction of live lanes to neighbour keys (+-1, +-8) and a
    few to far keys (periodic wrap analogue).  Payload rows unchanged —
    exactly what the push kernel does between sorts."""
    pk = pk.copy()
    k = pk[7, :np_].astype(np.int32)
    m = rng.random(np_) < frac
    delta = rng.choice([-8, -1, 1, 8], size=np_)
    k2 = np.where(m, (k + delta) % nvk, k)
    far = rng.random(np_) < far_frac
    k2 = np.where(far, rng.integers(0, nvk, size=np_), k2)
    pk[7, :np_] = k2.astype(np.float32)
    return pk


def _canon(pk, np_):
    """Order-insensitive canonical form of the live lanes (sorted rows of
    (key, payload) tuples) — intra-key order is physically meaningless."""
    live = pk[:, :np_]
    order = np.lexsort(live[::-1])
    return live[:, order]


def _check_sorted_output(pk_new, key0_new, ctot_new, pk_in, np_, n, nvk):
    key = pk_new[7, :np_].astype(np.int32)
    assert np.all(np.diff(key) >= 0), "live keys must be sorted"
    # exact multiset preservation (bitwise payloads)
    np.testing.assert_array_equal(_canon(pk_new, np_), _canon(pk_in, np_))
    # dead tail: all rows zero
    assert np.all(pk_new[:, np_:] == 0.0)
    # carried tables describe the output
    np.testing.assert_array_equal(key0_new[:np_], key)
    assert np.all(key0_new[np_:] == nvk)
    full = np.concatenate([key, np.full((n - np_,), nvk, np.int32)])
    v = np.arange(nvk + 3, dtype=np.int32)
    np.testing.assert_array_equal(
        ctot_new, np.searchsorted(full, v, side="left").astype(np.int32))


@pytest.mark.parametrize("np_frac", [1.0, 0.93])
def test_fast_path_perturbed(np_frac):
    rng = np.random.default_rng(7)
    n, nvk = 2048, 96
    np_ = int(n * np_frac)
    pk, key0, ctot = _mk_sorted(rng, n, np_, nvk)
    pk2 = _perturb(rng, pk, np_, nvk)
    out, k0n, ctn, anom = sps.merge_sort_packed(
        jnp.asarray(pk2), jnp.int32(np_), jnp.asarray(key0),
        jnp.asarray(ctot), nvk, **KW)
    assert int(anom) == 0
    _check_sorted_output(np.asarray(out), np.asarray(k0n),
                         np.asarray(ctn), pk2, np_, n, nvk)


def test_fast_path_actually_fast():
    """The no-snapshot sentinel must take the slow path; a valid snapshot
    with small drift must take the fast (kernel) path.  use_fast is traced
    internally, so probe it via the anomaly-free kernel flags plus a
    deliberate span-buster that must fall back."""
    rng = np.random.default_rng(3)
    n, nvk = 2048, 96
    np_ = n
    pk, key0, ctot = _mk_sorted(rng, n, np_, nvk)
    pk2 = _perturb(rng, pk, np_, nvk)
    # sentinel -> slow path (still correct)
    k0s = key0.copy()
    k0s[0] = -1
    out, k0n, ctn, anom = sps.merge_sort_packed(
        jnp.asarray(pk2), jnp.int32(np_), jnp.asarray(k0s),
        jnp.asarray(ctot), nvk, **KW)
    assert int(anom) == 0
    _check_sorted_output(np.asarray(out), np.asarray(k0n),
                         np.asarray(ctn), pk2, np_, n, nvk)


def test_mover_overflow_falls_back():
    """More movers than m_cap: the lax.cond must take the bitonic and the
    result must still be exact."""
    rng = np.random.default_rng(11)
    n, nvk = 2048, 96
    np_ = n
    pk, key0, ctot = _mk_sorted(rng, n, np_, nvk)
    pk2 = _perturb(rng, pk, np_, nvk, frac=0.6)   # ~1200 movers >> 256
    out, k0n, ctn, anom = sps.merge_sort_packed(
        jnp.asarray(pk2), jnp.int32(np_), jnp.asarray(key0),
        jnp.asarray(ctot), nvk, **KW)
    assert int(anom) == 0
    _check_sorted_output(np.asarray(out), np.asarray(k0n),
                         np.asarray(ctn), pk2, np_, n, nvk)


def test_sparse_wide_span_falls_back():
    """A near-empty grid (few particles over many keys) defeats the block
    key-span provisioning (W) — must fall back, not flag."""
    rng = np.random.default_rng(5)
    n, nvk = 1024, 4096
    np_ = 300
    pk, key0, ctot = _mk_sorted(rng, n, np_, nvk)
    pk2 = _perturb(rng, pk, np_, nvk, frac=0.1)
    out, k0n, ctn, anom = sps.merge_sort_packed(
        jnp.asarray(pk2), jnp.int32(np_), jnp.asarray(key0),
        jnp.asarray(ctot), nvk, **KW)
    assert int(anom) == 0
    _check_sorted_output(np.asarray(out), np.asarray(k0n),
                         np.asarray(ctn), pk2, np_, n, nvk)


def test_steady_state_chain():
    """Five perturb+sort rounds carrying key0/ctot forward — the steady
    state the engine runs in (no O(n) table rebuild after round 1)."""
    rng = np.random.default_rng(23)
    n, nvk = 2048, 128
    np_ = 1920
    pk, key0, ctot = _mk_sorted(rng, n, np_, nvk)
    key0 = key0.copy()
    key0[0] = -1        # engine start: no snapshot yet
    pk_j = jnp.asarray(pk)
    k0_j = jnp.asarray(key0)
    ct_j = jnp.asarray(ctot)
    for i in range(5):
        pk2 = _perturb(rng, np.asarray(pk_j), np_, nvk, frac=0.04)
        pk_j, k0_j, ct_j, anom = sps.merge_sort_packed(
            jnp.asarray(pk2), jnp.int32(np_), k0_j, ct_j, nvk, **KW)
        assert int(anom) == 0, f"round {i}"
        _check_sorted_output(np.asarray(pk_j), np.asarray(k0_j),
                             np.asarray(ct_j), pk2, np_, n, nvk)


def test_engine_packed_cycle_with_merge_sort(monkeypatch):
    """Full packed cycles through the public API with the merge re-sort
    enabled must conserve particles, drop zero movers, flag zero sort
    anomalies, and track the bitonic-sorted run's energies (both sorts
    are unstable, so intra-voxel deposit order — and hence f32 rounding —
    may differ; physics must not)."""
    import os

    from jax.experimental.pallas import tpu as pltpu2

    monkeypatch.setenv("VPIC_TPU_FORCE_FUSED", "1")
    monkeypatch.delenv("VPIC_TPU_DISABLE_PALLAS", raising=False)
    import __graft_entry__ as ge

    def run(force_merge):
        if force_merge:
            monkeypatch.setenv("VPIC_TPU_FORCE_MERGE_SORT", "1")
        else:
            monkeypatch.delenv("VPIC_TPU_FORCE_MERGE_SORT", raising=False)
        with pltpu2.force_tpu_interpret_mode():
            sim = ge._build(nx=8, ny=8, nz=1, npart=1500, ion_sort_mult=2)
            assert sim._cycle_body_packed is not None
            sim.advance(8)
            e = sim.energies()
            nm = {sp.name: int(np.asarray(sp.nm))
                  for sp in sim.state.species}
            npart = {sp.name: int(np.asarray(sp.np))
                     for sp in sim.state.species}
        return e, nm, npart

    try:
        eA, nmA, npA = run(False)
        eB, nmB, npB = run(True)
    finally:
        os.environ["VPIC_TPU_DISABLE_PALLAS"] = "1"
    assert npB == npA
    assert all(v == 0 for v in nmB.values()), nmB
    for k in eA:
        np.testing.assert_allclose(float(eB[k]), float(eA[k]),
                                   rtol=2e-5, atol=1e-12, err_msg=k)


def test_no_perturbation_identity():
    """Zero movers: the merge must reproduce the input exactly."""
    rng = np.random.default_rng(2)
    n, nvk = 1024, 64
    np_ = 1000
    pk, key0, ctot = _mk_sorted(rng, n, np_, nvk)
    out, k0n, ctn, anom = sps.merge_sort_packed(
        jnp.asarray(pk), jnp.int32(np_), jnp.asarray(key0),
        jnp.asarray(ctot), nvk, **KW)
    assert int(anom) == 0
    np.testing.assert_array_equal(np.asarray(out), pk)
