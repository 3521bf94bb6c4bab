"""Field <-> particle staging arrays.

- :func:`load_interpolator`: Yee fields -> 18 interpolation coefficients per
  voxel (src/sf_interface/load_interpolator.cxx:72-121): E gets a first-order
  in-plane expansion from 4-point sums/differences, B a linear one from
  2-point.
- :func:`unload_accumulator`: quadrant currents -> jf via the 7-point
  quadrant stencil scaled by 0.25*r*dA/dt
  (src/sf_interface/unload_accumulator.cxx:40-63).

The accumulator layout is ``(nv, 12)`` float32: components
[jx0..jx3, jy0..jy3, jz0..jz3] exactly like ``accumulator_t``
(sf_interface.h:60-77).  There are no per-pipeline replicas — race freedom
comes from XLA's deterministic scatter-add / segment-sum instead
(reduce_accumulators is therefore not needed).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.types import FieldState, Grid, N_IP


def load_interpolator(f: FieldState, g: Grid) -> jnp.ndarray:
    """Return the (nv, 18) interpolator array (IP layout in core.types)."""
    nzg, nyg, nxg = g.shape

    def shifted(arr, dx=0, dy=0, dz=0):
        # roll-free shift: pad with zeros at the far end; far-end entries
        # correspond to ghost voxels whose coefficients are never gathered.
        out = jnp.zeros_like(arr)
        src = arr[dz:, dy:, dx:]
        out = out.at[: nzg - dz, : nyg - dy, : nxg - dx].set(src)
        return out

    fourth, half = 0.25, 0.5

    def e_coeffs(w0, w1, w2, w3):
        a = fourth * ((w3 + w0) + (w1 + w2))
        b = fourth * ((w3 - w0) + (w1 - w2))
        c = fourth * ((w3 - w0) - (w1 - w2))
        d = fourth * ((w3 + w0) - (w1 + w2))
        return a, b, c, d

    # ex: w0=f0, w1=fy, w2=fz, w3=fyz
    ex, dexdy, dexdz, d2exdydz = e_coeffs(
        f.ex, shifted(f.ex, dy=1), shifted(f.ex, dz=1),
        shifted(f.ex, dy=1, dz=1))
    # ey: w0=f0, w1=fz, w2=fx, w3=fzx
    ey, deydz, deydx, d2eydzdx = e_coeffs(
        f.ey, shifted(f.ey, dz=1), shifted(f.ey, dx=1),
        shifted(f.ey, dz=1, dx=1))
    # ez: w0=f0, w1=fx, w2=fy, w3=fxy
    ez, dezdx, dezdy, d2ezdxdy = e_coeffs(
        f.ez, shifted(f.ez, dx=1), shifted(f.ez, dy=1),
        shifted(f.ez, dx=1, dy=1))

    cbx = half * (shifted(f.cbx, dx=1) + f.cbx)
    dcbxdx = half * (shifted(f.cbx, dx=1) - f.cbx)
    cby = half * (shifted(f.cby, dy=1) + f.cby)
    dcbydy = half * (shifted(f.cby, dy=1) - f.cby)
    cbz = half * (shifted(f.cbz, dz=1) + f.cbz)
    dcbzdz = half * (shifted(f.cbz, dz=1) - f.cbz)

    comps = [ex, dexdy, dexdz, d2exdydz,
             ey, deydz, deydx, d2eydzdx,
             ez, dezdx, dezdy, d2ezdxdy,
             cbx, dcbxdx, cby, dcbydy, cbz, dcbzdz]
    out = jnp.stack([c.reshape(-1) for c in comps], axis=-1)
    assert out.shape == (g.nv, N_IP)
    return out


def unload_accumulator(f: FieldState, acc: jnp.ndarray, g: Grid) -> FieldState:
    """Accumulated quadrant currents -> f.jf (unload_accumulator.cxx:40-63).

    jfx(x,y,z) += cx*( a0.jx[0] + a(y-1).jx[1] + a(z-1).jx[2]
                       + a(y-1,z-1).jx[3] ), over nodes [1,n+1]^transverse;
    assumes accumulator ghosts are zero (they are: particles live in owned
    voxels only).
    """
    a = acc.reshape(g.nzg, g.nyg, g.nxg, 12)
    cx = 0.25 * g.rdy * g.rdz / g.dt
    cy = 0.25 * g.rdz * g.rdx / g.dt
    cz = 0.25 * g.rdx * g.rdy / g.dt

    def back(arr, dx=0, dy=0, dz=0):
        """arr sampled at (x-dx, y-dy, z-dz) over the update block
        x,y,z in [1, n+1] (all three axes)."""
        return arr[1 - dz: g.nz + 2 - dz,
                   1 - dy: g.ny + 2 - dy,
                   1 - dx: g.nx + 2 - dx]

    blk = (slice(1, g.nz + 2), slice(1, g.ny + 2), slice(1, g.nx + 2))

    jfx = f.jfx.at[blk].add(cx * (
        back(a[..., 0]) + back(a[..., 1], dy=1)
        + back(a[..., 2], dz=1) + back(a[..., 3], dy=1, dz=1)))
    jfy = f.jfy.at[blk].add(cy * (
        back(a[..., 4]) + back(a[..., 5], dz=1)
        + back(a[..., 6], dx=1) + back(a[..., 7], dz=1, dx=1)))
    jfz = f.jfz.at[blk].add(cz * (
        back(a[..., 8]) + back(a[..., 9], dx=1)
        + back(a[..., 10], dy=1) + back(a[..., 11], dx=1, dy=1)))
    return f.replace(jfx=jfx, jfy=jfy, jfz=jfz)


def clear_jf(f: FieldState, g: Grid) -> FieldState:
    z = jnp.zeros(g.shape, dtype=jnp.float32)
    return f.replace(jfx=z, jfy=z, jfz=z)


def clear_rhof(f: FieldState, g: Grid) -> FieldState:
    return f.replace(rhof=jnp.zeros(g.shape, dtype=jnp.float32))
