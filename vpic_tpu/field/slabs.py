"""Slab/plane helpers for the Yee mesh.

Arrays are ``[z, y, x]`` with one ghost layer on every side.  Physical axes
are numbered 0=x, 1=y, 2=z (array dim = 2 - axis).  Component ownership
ranges encode the Yee staggering (field_advance.h:80-171):

- ``edge_a`` (ex/ey/ez, jf, tca): along axis a owned 1..n_a, transverse
  1..n+1 (the reference's {y}{z}_EDGE_LOOP ranges, local.c:25-44).
- ``face_a`` (cbx/cby/cbz): along axis a owned 1..n_a+1, transverse 1..n.
- ``node`` (rhof/rhob/div_e_err): 1..n+1 every axis.
- ``cell`` (div_b_err): 1..n every axis.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.types import Grid, FACE_AXIS, FACE_DIR  # noqa: F401

# physical axis -> array dimension
def adim(axis: int) -> int:
    return 2 - axis


def _n(g: Grid, axis: int) -> int:
    return (g.nx, g.ny, g.nz)[axis]


def own_slice(g: Grid, kind: str, axis: int) -> slice:
    """Ownership range of a component along one physical axis (inclusive
    1-based bounds converted to a python slice)."""
    n = _n(g, axis)
    if kind == "node":
        return slice(1, n + 2)
    if kind == "cell":
        return slice(1, n + 1)
    if kind.startswith("edge_"):
        a = "xyz".index(kind[-1])
        return slice(1, n + 1) if axis == a else slice(1, n + 2)
    if kind.startswith("face_"):
        a = "xyz".index(kind[-1])
        return slice(1, n + 2) if axis == a else slice(1, n + 1)
    raise ValueError(kind)


def plane_index(g: Grid, kind: str, axis: int, idx) -> tuple:
    """Index tuple selecting the plane ``axis == idx`` restricted to the
    component's transverse ownership ranges."""
    ix = [None, None, None]  # by physical axis
    for a in range(3):
        ix[a] = idx if a == axis else own_slice(g, kind, a)
    return (ix[2], ix[1], ix[0])  # [z, y, x]


def get_plane(g: Grid, arr, kind: str, axis: int, idx):
    return arr[plane_index(g, kind, axis, idx)]


def set_plane(g: Grid, arr, kind: str, axis: int, idx, value):
    return arr.at[plane_index(g, kind, axis, idx)].set(value)


def scale_plane(g: Grid, arr, kind: str, axis: int, idx, scale):
    return arr.at[plane_index(g, kind, axis, idx)].multiply(scale)


def interior(g: Grid, arr, kind: str):
    """The full owned block of a component."""
    ix = tuple(own_slice(g, kind, a) for a in (2, 1, 0))
    return arr[ix]


def shifted(g: Grid, arr, kind: str, dx=0, dy=0, dz=0):
    """The owned block of ``kind`` shifted by (dx,dy,dz) cells — i.e. the
    values of ``arr`` at (x+dx, y+dy, z+dz) for each owned (x,y,z)."""
    ix = []
    for a, d in ((2, dz), (1, dy), (0, dx)):
        s = own_slice(g, kind, a)
        ix.append(slice(s.start + d, s.stop + d))
    return arr[tuple(ix)]


def write_interior(g: Grid, arr, kind: str, value):
    ix = tuple(own_slice(g, kind, a) for a in (2, 1, 0))
    return arr.at[ix].set(value)


def zero_pad_like(g: Grid, value_interior, kind: str, dtype=jnp.float32):
    """Embed an interior block into a full ghosted array of zeros."""
    out = jnp.zeros(g.shape, dtype=dtype)
    return write_interior(g, out, kind, value_interior)
