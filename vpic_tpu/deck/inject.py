"""Runtime (in-step) particle injection.

The reference's ``inject_particle`` (src/vpic/misc.cxx:16-106) is callable
every step from ``begin_particle_injection``; production decks use it for
refluxing walls and beams.  This module packages the same contract for the
traced step: an :class:`Injector` built once per species converts global
double-precision coordinates to (voxel, cell-local) form, claims a static
block of particle slots, optionally deposits ``-q`` to ``rhob``
(misc.cxx:92-96), and hands aged lanes (misc.cxx:98-105) to the step's
boundary rounds via the pending-mover columns (``mdx..`` +
``pc=PC_EXHAUSTED``) — the same mechanism emitters use (emit/models.py),
so the aged partial push deposits current and honors walls exactly like
``move_p``.

Usage (from a deck)::

    inj = sim.make_injector("electron")

    def refill(state, acc, f):
        return inj(state, acc, f, x=..., y=..., z=..., ux=..., uy=...,
                   uz=..., q=..., age=..., update_rhob=True)

    sim.finalize(user_particle_injection=refill)

All arguments are traced arrays of one common static length K; ``valid``
masks lanes off (masked lanes cost a zombie slot reclaimed by the next
sort, exactly like gated emitter slots).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import PERIODIC_FIELDS, Grid
from ..particles.aux import accumulate_rhob
from ..particles.push import PC_EXHAUSTED


def _cellify(c, c0, c1, n):
    """Global fp64 coordinate -> (cell-local [-1,1], 1-based cell index):
    the robust double-precision placement of misc.cxx:53-77, including the
    far-wall conditional moves (c == c1 lands on index n with t = 1)."""
    t = n * ((c - c0) / (c1 - c0))
    ic = jnp.floor(t).astype(jnp.int32)
    t = t - ic
    t = (t + t) - 1.0
    far = ic == n
    t = jnp.where(far, 1.0, t)
    ic = jnp.where(far, n - 1, ic) + 1
    return t.astype(jnp.float32), ic


@dataclasses.dataclass(frozen=True)
class Injector:
    """In-step particle injector for one species (misc.cxx:16-106)."""

    sid: int
    g: Grid
    # (gpz, gpy, gpx, 3) shard origin table for multishard ownership
    origins: np.ndarray

    def __call__(self, state, acc, f, x, y, z, ux, uy, uz, q,
                 age=None, tag=None, valid=None, update_rhob=True):
        g = self.g
        x = jnp.atleast_1d(jnp.asarray(x, jnp.float64))
        K = x.shape[0]

        def arr(v, dt=jnp.float64):
            return jnp.broadcast_to(jnp.asarray(v, dt), (K,))

        y, z = arr(y), arr(z)
        uxf = arr(ux, jnp.float32)
        uyf = arr(uy, jnp.float32)
        uzf = arr(uz, jnp.float32)
        qf = arr(q, jnp.float32)
        ok = jnp.ones((K,), bool) if valid is None else arr(valid, bool)

        # ---- local domain (multishard: this shard's corner via its mesh
        # coordinates, the partition_periodic_box layout) ----
        if g.is_multishard:
            from ..engine import distributed as dist

            idx = [jax.lax.axis_index(a) for a in dist.AXIS_NAMES]
            org = jnp.asarray(self.origins)      # (gpz, gpy, gpx, 3)
            o = org[idx[0], idx[1], idx[2]]
            x0s, y0s, z0s = o[0], o[1], o[2]
        else:
            x0s, y0s, z0s = g.gx0, g.gy0, g.gz0
        lx = (g.gx1 - g.gx0) / g.gpx
        ly = (g.gy1 - g.gy0) / g.gpy
        lz = (g.gz1 - g.gz0) / g.gpz
        x1s, y1s, z1s = x0s + lx, y0s + ly, z0s + lz

        # ownership: strictly inside, or on the high wall where the global
        # face is a local boundary (misc.cxx:38-40 far-wall rule)
        def own1(c, c0, c1, axis_hi_bc):
            inside = (c >= c0) & (c < c1)
            far = (c == c1) & (axis_hi_bc != PERIODIC_FIELDS)
            return inside | far

        ok = (ok
              & own1(x, x0s, x1s, g.fbc[3])
              & own1(y, y0s, y1s, g.fbc[4])
              & own1(z, z0s, z1s, g.fbc[5]))

        dx, ix = _cellify(x, x0s, x1s, g.nx)
        dy, iy = _cellify(y, y0s, y1s, g.ny)
        dz, iz = _cellify(z, z0s, z1s, g.nz)
        vox = (ix + g.nxg * (iy + g.nyg * iz)).astype(jnp.int32)

        sp = state.species[self.sid]

        # ---- static slot block at sp.np (emit/models.py:182-189);
        # masked-off lanes become zombies reclaimed by the next sort ----
        slot = sp.np + jnp.arange(K, dtype=jnp.int32)
        okc = ok & (slot < sp.max_np)
        tgt = jnp.where(slot < sp.max_np, slot, sp.max_np)
        q_new = jnp.where(okc, qf, 0.0)
        vox_w = jnp.where(okc, vox, -1)

        if update_rhob:
            # injected charge deposits -q to rhob (misc.cxx:92-96)
            f = accumulate_rhob(f, g, jnp.maximum(vox, 0), -qf,
                                dx, dy, dz, okc)

        # ---- aging (misc.cxx:98-105): the pending-mover columns hand the
        # partial push to the step's boundary rounds (process_boundary
        # walks pc==PC_EXHAUSTED lanes with move_p semantics + deposits) --
        if age is None:
            mdx = mdy = mdz = jnp.zeros((K,), jnp.float32)
            pc = jnp.zeros((K,), jnp.int32)
        else:
            agef = arr(age, jnp.float32)
            gamma = jnp.sqrt(uxf * uxf + uyf * uyf + uzf * uzf + 1.0)
            aging = agef * jnp.float32(g.cvac * g.dt) / gamma
            mdx = uxf * aging * jnp.float32(g.rdx)
            mdy = uyf * aging * jnp.float32(g.rdy)
            mdz = uzf * aging * jnp.float32(g.rdz)
            pc = jnp.where(okc & (agef != 0), PC_EXHAUSTED, 0)

        def put(a, vals):
            return a.at[tgt].set(vals, mode="drop")

        upd = dict(
            dx=put(sp.dx, dx), dy=put(sp.dy, dy), dz=put(sp.dz, dz),
            i=put(sp.i, vox_w),
            ux=put(sp.ux, uxf), uy=put(sp.uy, uyf), uz=put(sp.uz, uzf),
            q=put(sp.q, q_new),
            mdx=put(sp.mdx, mdx), mdy=put(sp.mdy, mdy),
            mdz=put(sp.mdz, mdz),
            pc=put(sp.pc, pc),
            np=jnp.minimum(
                sp.np + jnp.max(jnp.where(
                    okc, jnp.arange(1, K + 1, dtype=jnp.int32), 0)),
                sp.max_np),
        )
        if tag is not None:
            upd["tag"] = put(sp.tag, arr(tag, jnp.int32))
        sp = sp.replace(**upd)

        species = list(state.species)
        species[self.sid] = sp
        state = dataclasses.replace(state, species=tuple(species))
        return state, acc, f
