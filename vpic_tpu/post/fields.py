"""Field post-processing — NumPy ports of the reference's analysis
toolbox (interfaces/matlab/gauge_fields.m, smooth_field.m,
center_field.m; interfaces/c/poynting2d.c's physics):

- :func:`gauge_fields`: Coulomb-gauge scalar/vector potentials and the
  microscopic charge density from Yee-mesh E/B via FFT inversion of the
  7-point Laplacian (gauge_fields.m:28-41 math).
- :func:`smooth_field`: isotropic Fourier low-pass with a linear
  transition band between lambda_pass and lambda_stop
  (smooth_field.m:33-52).
- :func:`center_field`: node-centering by averaging, optionally undone
  spectrally (center_field.m:36-72).
- :func:`poynting_flux`: node-centered S = E x B / mu0 plus the 2D
  domain-boundary flux lines the poynting2d.c join tool consumes.

Array convention: owned interior fields shaped (nz, ny, nx) in C order
(z slowest), i.e. ``FieldState`` arrays with ghosts stripped
(``owned_interior``).  All operations assume a periodic grid, like the
originals.
"""

from __future__ import annotations

import numpy as np


def owned_interior(a, g):
    """Strip ghost planes from a (nzg, nyg, nxg) field array."""
    a = np.asarray(a)
    return a[1:g.nz + 1, 1:g.ny + 1, 1:g.nx + 1]


def _inv_laplacian_kernel(nx, ny, nz, dx, dy, dz):
    """Discretized 1/k^2 for the 7-point Yee Laplacian
    (gauge_fields.m:78-87), in (z,y,x) order."""
    gx = ((2.0 / dx) * np.sin((np.pi / nx) * np.arange(nx))) ** 2
    gy = ((2.0 / dy) * np.sin((np.pi / ny) * np.arange(ny))) ** 2
    gz = ((2.0 / dz) * np.sin((np.pi / nz) * np.arange(nz))) ** 2
    kern = (gz[:, None, None] + gy[None, :, None] + gx[None, None, :])
    kern[0, 0, 0] = 1.0
    kern = 1.0 / kern
    kern[0, 0, 0] = 0.0          # integral of potential = 0
    return kern


def _ddx_back(a, d, axis):
    """Backward difference with periodic wrap: (a - roll(a, +1)) / d."""
    return (a - np.roll(a, 1, axis=axis)) / d


def gauge_fields(g, ex, ey, ez, bx, by, bz, eps0=None):
    """(phi, ax, ay, az, rho) in the Coulomb gauge (gauge_fields.m).

    Inputs are owned-interior Yee fields, (nz, ny, nx).  ``rho`` is
    eps0 * div E (microscopic charge density); potentials integrate to
    zero over the box."""
    eps0 = g.eps0 if eps0 is None else eps0
    nx, ny, nz = g.nx, g.ny, g.nz
    dx, dy, dz = g.dx, g.dy, g.dz
    kern = _inv_laplacian_kernel(nx, ny, nz, dx, dy, dz)

    # div E on the Yee mesh (backward differences, gauge_fields.m:91-93)
    dive = (_ddx_back(ex, dx, 2) + _ddx_back(ey, dy, 1)
            + _ddx_back(ez, dz, 0))
    phi = np.real(np.fft.ifftn(kern * np.fft.fftn(dive)))

    # A = curl G with laplacian G = -B (gauge_fields.m:96-102)
    gx = np.real(np.fft.ifftn(kern * np.fft.fftn(bx)))
    gy = np.real(np.fft.ifftn(kern * np.fft.fftn(by)))
    gz = np.real(np.fft.ifftn(kern * np.fft.fftn(bz)))
    ax = _ddx_back(gz, dy, 1) - _ddx_back(gy, dz, 0)
    ay = _ddx_back(gx, dz, 0) - _ddx_back(gz, dx, 2)
    az = _ddx_back(gy, dx, 2) - _ddx_back(gx, dy, 1)

    return phi, ax, ay, az, eps0 * dive


def smooth_field(g, v, lambda_stop, lambda_pass):
    """Fourier low-pass (smooth_field.m): wavelengths < lambda_stop
    removed, > lambda_pass preserved, linear roll-off between."""
    v = np.asarray(v, np.float64)
    nz, ny, nx = v.shape

    def kline(n, d):
        k = 2 * np.pi * np.arange(n) / n
        k = k - 2 * np.pi * (k > np.pi)
        return k / d

    kx = kline(nx, g.dx)
    ky = kline(ny, g.dy)
    kz = kline(nz, g.dz)
    kr2 = (kz[:, None, None] ** 2 + ky[None, :, None] ** 2
           + kx[None, None, :] ** 2)
    kp2 = (2 * np.pi / lambda_pass) ** 2
    ks2 = (2 * np.pi / lambda_stop) ** 2
    hk = ((kr2 < kp2) * 1.0
          + ((kr2 >= kp2) & (kr2 <= ks2)) * (ks2 - kr2) / (ks2 - kp2))
    return np.real(np.fft.ifftn(hk * np.fft.fftn(v)))


def center_field(g, v, centered=(False, False, False), method=0):
    """Node-center ``v`` on a periodic grid (center_field.m).

    ``centered[a]`` is True when v is ALREADY node-aligned along axis a
    (x, y, z physical order); non-aligned axes are averaged with the
    periodic backward neighbor.  method=1 spectrally undoes the
    averaging's amplitude response (center_field.m:48-72)."""
    v = np.asarray(v, np.float64)
    nz, ny, nx = v.shape
    for a, n in ((0, nz), (1, ny), (2, nx)):
        phys = 2 - a
        if not centered[phys]:
            v = 0.5 * (np.roll(v, 1, axis=a) + v)
    if method == 1:
        def filt(n, needs):
            gl = np.abs(np.cos(np.pi * np.arange(n) / n)) if needs \
                else np.ones(n)
            if needs and n % 2 == 0:
                gl[n // 2] = 1.0
            gl = 1.0 / gl
            if needs and n % 2 == 0:
                gl[n // 2] = 0.0    # lost Nyquist info
            return gl
        gz = filt(nz, not centered[2])
        gy = filt(ny, not centered[1])
        gx = filt(nx, not centered[0])
        hk = (gz[:, None, None] * gy[None, :, None] * gx[None, None, :])
        v = np.real(np.fft.ifftn(hk * np.fft.fftn(v)))
    return v


def poynting_flux(g, ex, ey, ez, cbx, cby, cbz, mu0=1.0):
    """Node-centered Poynting vector S = E x B / mu0 from owned-interior
    Yee fields, plus the 2D boundary flux lines (x-z plane) the
    poynting2d.c join tool aggregates: (sx, sy, sz, lines) with
    lines = dict(top, bottom, left, right) — S_z along the z faces
    (length nx) and S_x along the x faces (length nz)."""
    # Yee alignment: ex on x-edges (centered in x? no: ex needs x-avg),
    # cbx on x-faces (needs y,z-avg).  centered[a] True = node-aligned.
    exc = center_field(g, ex, centered=(False, True, True))
    eyc = center_field(g, ey, centered=(True, False, True))
    ezc = center_field(g, ez, centered=(True, True, False))
    bxc = center_field(g, cbx, centered=(True, False, False))
    byc = center_field(g, cby, centered=(False, True, False))
    bzc = center_field(g, cbz, centered=(False, False, True))
    sx = (eyc * bzc - ezc * byc) / mu0
    sy = (ezc * bxc - exc * bzc) / mu0
    sz = (exc * byc - eyc * bxc) / mu0
    ymid = sx.shape[1] // 2
    lines = dict(
        bottom=sz[0, ymid, :].copy(), top=sz[-1, ymid, :].copy(),
        left=sx[:, ymid, 0].copy(), right=sx[:, ymid, -1].copy(),
    )
    return sx, sy, sz, lines
