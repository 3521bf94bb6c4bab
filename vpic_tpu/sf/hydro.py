"""Hydrodynamic moment staging (src/sf_interface/hydro.c).

The hydro array is ``(nv, 14)`` float32 in the HYDRO component order
(sf_interface.h:28-38: jx,jy,jz,rho,px,py,pz,ke,txx,tyy,tzz,tyz,tzx,txy).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.types import FieldState, Grid, PERIODIC_FIELDS
from ..field.ghost import _face_geom, _kp_ix, _apply_local_mask
from ..particles.aux import N_HYDRO


def clear_hydro(g: Grid):
    return jnp.zeros((g.nv, N_HYDRO), dtype=jnp.float32)


def _node_plane(g: Grid, h4, X, fi):
    ix = _kp_ix(g, "node", X, fi)
    return (ix[0], ix[1], ix[2], slice(None))


def local_adjust_hydro(h, g: Grid, comm):
    """Double every component on local-BC node planes (hydro.c:132-165)."""
    h4 = h.reshape(g.nzg, g.nyg, g.nxg, N_HYDRO)
    for face in range(6):
        X, _, lo, gi, mi, fi = _face_geom(g, face)
        if g.fbc[face] == PERIODIC_FIELDS:
            continue
        ix = _node_plane(g, h4, X, fi)
        orig = h4[ix]
        sel = _apply_local_mask(comm, g, face, orig, 2.0 * orig)
        if sel is not None:
            h4 = h4.at[ix].set(sel)
    return h4.reshape(g.nv, N_HYDRO)


def synchronize_hydro(h, g: Grid, comm):
    """Additive node-plane merge of all 14 moments before dumps
    (hydro.c:28-124); three sequential axis passes like synchronize_jf."""
    h = local_adjust_hydro(h, g, comm)
    h4 = h.reshape(g.nzg, g.nyg, g.nxg, N_HYDRO)
    for axis in range(3):
        faces = (axis, axis + 3)
        payloads = {}
        for face in faces:
            X, _, lo, gi, mi, fi = _face_geom(g, face)
            payloads[face] = h4[_node_plane(g, h4, X, fi)]
        recv = comm.exchange(payloads)
        for face in faces:
            rv = recv.get(face)
            if rv is None:
                continue
            X, _, lo, gi, mi, fi = _face_geom(g, face)
            ix = _node_plane(g, h4, X, fi)
            own = h4[ix]
            new = own + rv
            mask = (comm.is_global_boundary(face)
                    if hasattr(comm, "is_global_boundary")
                    and g.fbc[face] != PERIODIC_FIELDS else False)
            if mask is not False:
                new = jnp.where(mask, own, new)
            h4 = h4.at[ix].set(new)
    return h4.reshape(g.nv, N_HYDRO)
