"""Post-processing toolbox (gauge_fields.m / smooth_field.m /
center_field.m / poynting2d analogues)."""

import numpy as np
import pytest

from vpic_tpu.core.types import Grid
from vpic_tpu.post import fields as post


@pytest.fixture
def g():
    return Grid(nx=16, ny=8, nz=4, gx1=2.0, gy1=1.0, gz1=0.5)


def _shape(g):
    return (g.nz, g.ny, g.nx)


def test_gauge_fields_reproduces_curl_and_div(g):
    """curl A must reproduce the solenoidal part of B, and rho = eps0
    div E (gauge_fields.m math)."""
    rng = np.random.default_rng(0)
    # build a periodic, divergence-free B from a random G: B = curl G
    gx, gy, gz = (rng.normal(size=_shape(g)) for _ in range(3))
    for a in (0, 1, 2):                      # smooth it to avoid noise
        gx = (np.roll(gx, 1, a) + gx + np.roll(gx, -1, a)) / 3
        gy = (np.roll(gy, 1, a) + gy + np.roll(gy, -1, a)) / 3
        gz = (np.roll(gz, 1, a) + gz + np.roll(gz, -1, a)) / 3

    def ddb(a, d, axis):                 # backward difference
        return (a - np.roll(a, 1, axis=axis)) / d

    def ddf(a, d, axis):                 # forward difference
        return (np.roll(a, -1, axis=axis) - a) / d

    # Yee identity: A comes out of the tool via the backward curl, so the
    # complementary FORWARD curl closes curl_f(curl_b(G)) = -laplacian G
    # when div_f G' = 0 — build B with the forward curl accordingly
    bx = ddf(gz, g.dy, 1) - ddf(gy, g.dz, 0)
    by = ddf(gx, g.dz, 0) - ddf(gz, g.dx, 2)
    bz = ddf(gy, g.dx, 2) - ddf(gx, g.dy, 1)

    ex, ey, ez = (rng.normal(size=_shape(g)) for _ in range(3))
    phi, ax, ay, az, rho = post.gauge_fields(g, ex, ey, ez, bx, by, bz)

    # rho = eps0 div E on the Yee mesh
    dive = ddb(ex, g.dx, 2) + ddb(ey, g.dy, 1) + ddb(ez, g.dz, 0)
    np.testing.assert_allclose(rho, g.eps0 * dive, rtol=1e-10, atol=1e-12)

    # forward-curl A == B (B was built divergence-free)
    cbx = ddf(az, g.dy, 1) - ddf(ay, g.dz, 0)
    cby = ddf(ax, g.dz, 0) - ddf(az, g.dx, 2)
    cbz = ddf(ay, g.dx, 2) - ddf(ax, g.dy, 1)
    scale = np.abs(bx).max()
    np.testing.assert_allclose(cbx, bx, atol=1e-9 * scale)
    np.testing.assert_allclose(cby, by, atol=1e-9 * scale)
    np.testing.assert_allclose(cbz, bz, atol=1e-9 * scale)

    # potentials integrate to ~0 (gauge_fields.m kernel zeroing)
    for p in (phi, ax, ay, az):
        assert abs(p.mean()) < 1e-10 * (abs(p).max() + 1e-30)


def test_smooth_field_passband(g):
    """Long wavelengths pass untouched; short ones are removed."""
    z, y, x = np.meshgrid(np.arange(g.nz), np.arange(g.ny),
                          np.arange(g.nx), indexing="ij")
    long_wave = np.cos(2 * np.pi * x / g.nx)          # lambda = Lx
    short_wave = np.cos(2 * np.pi * x * (g.nx // 2) / g.nx)
    v = long_wave + short_wave
    Lx = g.dx * g.nx
    sv = post.smooth_field(g, v, lambda_stop=Lx / 4, lambda_pass=Lx / 2)
    np.testing.assert_allclose(sv, long_wave, atol=1e-10)


def test_center_field_averaging(g):
    """A field offset half a cell in x node-centers to the midpoint
    average; spectral method inverts it for band-limited data."""
    x = np.arange(g.nx)
    v = np.broadcast_to(np.cos(2 * np.pi * (x + 0.5) / g.nx),
                        _shape(g)).copy()
    cv = post.center_field(g, v, centered=(False, True, True))
    expect = 0.5 * (np.cos(2 * np.pi * (x + 0.5) / g.nx)
                    + np.cos(2 * np.pi * (x - 0.5) / g.nx))
    np.testing.assert_allclose(cv[0, 0], expect, atol=1e-12)
    # spectral mode: amplitude response undone for this single mode
    cv2 = post.center_field(g, v, centered=(False, True, True), method=1)
    np.testing.assert_allclose(cv2[0, 0], np.cos(2 * np.pi * x / g.nx),
                               atol=1e-10)


def test_poynting_flux_uniform_cross_field(g):
    """Uniform E_y x B_z -> S_x = Ey*Bz everywhere; boundary lines match."""
    zeros = np.zeros(_shape(g))
    ey = np.full(_shape(g), 2.0)
    bz = np.full(_shape(g), 3.0)
    sx, sy, sz, lines = post.poynting_flux(g, zeros, ey, zeros,
                                           zeros, zeros, bz)
    np.testing.assert_allclose(sx, 6.0, atol=1e-12)
    np.testing.assert_allclose(sy, 0.0, atol=1e-12)
    np.testing.assert_allclose(sz, 0.0, atol=1e-12)
    np.testing.assert_allclose(lines["left"], 6.0)
    assert lines["top"].shape == (g.nx,)
    assert lines["left"].shape == (g.nz,)


def test_owned_interior_strips_ghosts(g):
    a = np.zeros((g.nzg, g.nyg, g.nxg))
    a[1:g.nz + 1, 1:g.ny + 1, 1:g.nx + 1] = 7.0
    assert (post.owned_interior(a, g) == 7.0).all()
