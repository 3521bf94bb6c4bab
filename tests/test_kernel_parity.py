"""Kernel parity vs the NumPy scalar transcription of the reference
(tests/ref/ref_impl.py).  fp32 kernels vs fp64 reference: rtol ~1e-5."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.ref import ref_impl as R

from vpic_tpu.comm.facecomm import LocalComm
from vpic_tpu.core.types import FieldState, Grid, PERIODIC_FIELDS, vacuum_material_table
from vpic_tpu.core.types import SpeciesState
from vpic_tpu.field import stencil
from vpic_tpu.grid.partition import make_grid_arrays
from vpic_tpu.particles import push as ppush
from vpic_tpu.sf import interp as sfi

NX, NY, NZ = 6, 5, 4
DT = 0.04


def mk():
    rng = np.random.default_rng(42)
    rg = R.G(NX, NY, NZ, dt=DT)
    g = Grid(nx=NX, ny=NY, nz=NZ, dt=DT, cvac=1.0, eps0=1.0,
             gx1=1.0, gy1=1.0, gz1=1.0,
             fbc=(PERIODIC_FIELDS,) * 6, pbc=(PERIODIC_FIELDS,) * 6)
    fr = R.zero_fields(rg)
    for k in ("ex", "ey", "ez", "cbx", "cby", "cbz", "jfx", "jfy", "jfz",
              "tcax", "tcay", "tcaz"):
        fr[k][...] = rng.normal(size=fr[k].shape).astype(np.float32)
    fj = FieldState.zeros(g).replace(
        **{k: jnp.asarray(fr[k].astype(np.float32))
           for k in fr})
    return rng, rg, g, fr, fj


def owned(g, arr):
    return np.asarray(arr)[1:g.nz + 1, 1:g.ny + 1, 1:g.nx + 1]


def test_load_interpolator_parity():
    rng, rg, g, fr, fj = mk()
    ip_ref = R.load_interpolator(fr, rg)
    ip = np.asarray(sfi.load_interpolator(fj, g))
    # compare owned voxels only
    mask = np.zeros((g.nzg, g.nyg, g.nxg), bool)
    mask[1:NZ + 1, 1:NY + 1, 1:NX + 1] = True
    mask = mask.reshape(-1)
    np.testing.assert_allclose(ip[mask], ip_ref[mask], rtol=2e-5, atol=1e-6)


def test_advance_b_parity():
    rng, rg, g, fr, fj = mk()
    R.advance_b(fr, rg, 0.5)
    out = stencil.advance_b(fj, g, 0.5)
    for c in ("cbx", "cby", "cbz"):
        np.testing.assert_allclose(
            owned(g, getattr(out, c)), fr[c][1:NZ + 1, 1:NY + 1, 1:NX + 1],
            rtol=2e-5, atol=1e-5)


def test_advance_e_vacuum_parity():
    rng, rg, g, fr, fj = mk()
    comm = LocalComm(g)
    mat = vacuum_material_table()
    R.advance_e_vacuum(fr, rg)
    out = stencil.advance_e(fj, g, mat, None, comm)
    for c in ("ex", "ey", "ez", "tcax", "tcay", "tcaz"):
        np.testing.assert_allclose(
            owned(g, getattr(out, c)), fr[c][1:NZ + 1, 1:NY + 1, 1:NX + 1],
            rtol=3e-5, atol=2e-5, err_msg=c)


def test_unload_accumulator_parity():
    rng, rg, g, fr, fj = mk()
    acc = rng.normal(size=(g.nv, 12))
    # ghost accumulator entries are assumed zero by the kernel
    mask = np.zeros((g.nzg, g.nyg, g.nxg), bool)
    mask[1:NZ + 1, 1:NY + 1, 1:NX + 1] = True
    acc[~mask.reshape(-1)] = 0.0
    R.unload_accumulator(fr, acc, rg)
    out = sfi.unload_accumulator(fj, jnp.asarray(acc, jnp.float32), g)
    for c in ("jfx", "jfy", "jfz"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, c))[1:NZ + 2, 1:NY + 2, 1:NX + 2],
            fr[c][1:NZ + 2, 1:NY + 2, 1:NX + 2],
            rtol=2e-5, atol=1e-5, err_msg=c)


def _random_particles(rng, rg, n, hot=False):
    p = {}
    p["dx"] = rng.uniform(-1, 1, n)
    p["dy"] = rng.uniform(-1, 1, n)
    p["dz"] = rng.uniform(-1, 1, n)
    x = rng.integers(1, rg.nx + 1, n)
    y = rng.integers(1, rg.ny + 1, n)
    z = rng.integers(1, rg.nz + 1, n)
    p["i"] = rg.voxel(x, y, z).astype(np.int64)
    ut = 3.0 if hot else 0.2  # hot -> many cell crossings
    p["ux"] = rng.normal(0, ut, n)
    p["uy"] = rng.normal(0, ut, n)
    p["uz"] = rng.normal(0, ut, n)
    p["q"] = rng.uniform(0.5, 1.5, n)
    return p


@pytest.mark.parametrize("hot", [False, True])
def test_advance_p_parity(hot):
    rng, rg, g, fr, fj = mk()
    # scale down fields so the push is well-conditioned
    for k in ("ex", "ey", "ez", "cbx", "cby", "cbz"):
        fr[k] *= 0.1
    fj = fj.replace(**{k: getattr(fj, k) * 0.1
                       for k in ("ex", "ey", "ez", "cbx", "cby", "cbz")})

    n = 200
    p = _random_particles(rng, rg, n, hot)
    pr = {k: v.copy() for k, v in p.items()}

    ip_ref = R.load_interpolator(fr, rg)
    acc_ref = np.zeros((rg.nv, 12))
    R.advance_p(pr, -1.0, ip_ref, acc_ref, rg)

    interp = sfi.load_interpolator(fj, g)
    sp = SpeciesState.create("e", 0, -1.0, n)
    sp = sp.replace(
        np=jnp.int32(n),
        dx=jnp.asarray(p["dx"], jnp.float32),
        dy=jnp.asarray(p["dy"], jnp.float32),
        dz=jnp.asarray(p["dz"], jnp.float32),
        i=jnp.asarray(p["i"], jnp.int32),
        ux=jnp.asarray(p["ux"], jnp.float32),
        uy=jnp.asarray(p["uy"], jnp.float32),
        uz=jnp.asarray(p["uz"], jnp.float32),
        q=jnp.asarray(p["q"], jnp.float32),
    )
    ga = make_grid_arrays(g)
    acc = jnp.zeros((g.nv, 12), jnp.float32)
    sp2, acc2 = jax.jit(
        lambda sp, acc: ppush.advance_p(sp, interp, acc, ga.neighbor, g,
                                        max_nm=n, n_walk=4))(sp, acc)

    assert int(sp2.nm) == 0
    np.testing.assert_array_equal(np.asarray(sp2.i), pr["i"].astype(np.int32))
    for c in ("ux", "uy", "uz"):
        np.testing.assert_allclose(np.asarray(getattr(sp2, c)), pr[c],
                                   rtol=1e-4, atol=1e-5, err_msg=c)
    for c in ("dx", "dy", "dz"):
        np.testing.assert_allclose(np.asarray(getattr(sp2, c)), pr[c],
                                   rtol=1e-3, atol=2e-4, err_msg=c)
    np.testing.assert_allclose(np.asarray(acc2), acc_ref,
                               rtol=1e-3, atol=2e-4)
