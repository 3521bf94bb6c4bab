"""Shared-face synchronization (remote.c:298-622).

Three sequential axis passes (x, then y, then z) like the reference, so that
edge/corner values are merged transitively without explicit corner messages
(remote.c:283-292).  With uniform cell spacing the reference's weights
reduce to: jf -> sum, rhof -> sum, rhob -> average, tang-e/norm-b -> average.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.types import FieldState, Grid, PERIODIC_FIELDS
from . import ghost
from .ghost import _kp_ix, _face_geom, CYC, _E, _TCA, _JF, _CB


def _merge_pass(f_arrays, g: Grid, comm, axis: int, specs):
    """One axis pass.  specs: list of (array_key, kind_fn, combine) where
    kind_fn(face) -> (kind, fixed-plane index) and combine(own, recv)."""
    faces = (axis, axis + 3)
    payloads = {}
    for face in faces:
        X, _, lo, gi, mi, fi = _face_geom(g, face)
        payloads[face] = tuple(
            f_arrays[key][_kp_ix(g, kind, X, fi)]
            for key, kind, _ in specs
        )
    # opp() pairing works within the pair since OPP maps axis<->axis+3
    recv = comm.exchange(payloads)

    err = jnp.float64(0.0)
    for face in faces:
        if recv.get(face) is None:
            continue
        X, _, lo, gi, mi, fi = _face_geom(g, face)
        mask = (comm.is_global_boundary(face)
                if hasattr(comm, "is_global_boundary")
                and g.fbc[face] != PERIODIC_FIELDS else False)
        for k, (key, kind, combine) in enumerate(specs):
            ix = _kp_ix(g, kind, X, fi)
            own = f_arrays[key][ix]
            rv = recv[face][k]
            new, e = combine(own, rv)
            if mask is not False:
                new = jnp.where(mask, own, new)
                if e is not None:
                    e = jnp.where(mask, 0.0, e)
            f_arrays[key] = f_arrays[key].at[ix].set(new)
            if e is not None:
                err = err + jnp.sum(e.astype(jnp.float64))
    return err


def _sum(own, recv):
    return own + recv, None


def _avg(own, recv):
    return 0.5 * (own + recv), None


def _avg_err(own, recv):
    d = (own.astype(jnp.float64) - recv.astype(jnp.float64))
    return 0.5 * (own + recv), d * d


def synchronize_jf(f: FieldState, g: Grid, comm) -> FieldState:
    """Additive merge of face current (remote.c:416-506)."""
    f = ghost.adjust_jf(f, g, comm)
    arrays = {c: getattr(f, c) for c in _JF}
    for axis in range(3):
        Y, Z = CYC[axis]
        specs = [
            (_JF[Y], "edge_" + "xyz"[Y], _sum),
            (_JF[Z], "edge_" + "xyz"[Z], _sum),
        ]
        _merge_pass(arrays, g, comm, axis, specs)
    return f.replace(**arrays)


def synchronize_rho(f: FieldState, g: Grid, comm) -> FieldState:
    """rhof summed, rhob averaged across shared node planes
    (remote.c:532-621)."""
    f = ghost.adjust_rhof(f, g, comm)
    f = ghost.adjust_rhob(f, g, comm)
    arrays = {"rhof": f.rhof, "rhob": f.rhob}
    for axis in range(3):
        specs = [
            ("rhof", "node", _sum),
            ("rhob", "node", _avg),
        ]
        _merge_pass(arrays, g, comm, axis, specs)
    return f.replace(**arrays)


def synchronize_tang_e_norm_b(f: FieldState, g: Grid, comm):
    """Average shared tangential E / normal B, returning the global
    desynchronization error (remote.c:298-414).  Caller psums the error
    across shards."""
    f = ghost.adjust_tang_e(f, g, comm)
    f = ghost.adjust_norm_b(f, g, comm)
    arrays = {c: getattr(f, c) for c in _E + _TCA + _CB}
    err = jnp.float64(0.0)
    for axis in range(3):
        Y, Z = CYC[axis]
        specs = [
            (_CB[axis], "face_" + "xyz"[axis], _avg_err),
            (_E[Y], "edge_" + "xyz"[Y], _avg_err),
            (_TCA[Y], "edge_" + "xyz"[Y], _avg),
            (_E[Z], "edge_" + "xyz"[Z], _avg_err),
            (_TCA[Z], "edge_" + "xyz"[Z], _avg),
        ]
        err = err + _merge_pass(arrays, g, comm, axis, specs)
    return f.replace(**arrays), err
