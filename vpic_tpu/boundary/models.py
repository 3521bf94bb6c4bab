"""Custom particle boundary handlers (src/boundary/, 359 LoC).

The reference registers per-face callbacks invoked particle-by-particle
inside boundary_p (grid.h:32-41, boundary_p.c:271-277).  Here a handler is
a vectorized, jittable object applied to the compacted pending buffer for
all particles whose ``pc`` code addresses it.  Codes encode both the
handler and the face: ``pc = -(9 + handler_id*6 + face)``.

Models:
- :class:`MaxwellianReflux`  (maxwellian_reflux.c:48-170): re-emit with a
  bi-Maxwellian flux distribution (ut_para/ut_perp per species), residual
  displacement rescaled by the aging ratio.
- :class:`AbsorbTally`       (absorb_tally.c): absorb + per-species count.
- :class:`LinkBoundary`      (link.c:17-120): absorb + record each hit in a
  fixed-capacity ring buffer that the host drains to ``link.<rank>`` files.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.types import Grid, NEIGHBOR_CUSTOM_BASE
from ..particles.aux import accumulate_rhob
from ..particles.push import PC_EXHAUSTED

SQRT2 = math.sqrt(2.0)

# face -> (index of u_para in (x,y,z), perm): perm[face] maps
# (para, perp1, perp2) -> (ux, uy, uz) (maxwellian_reflux.c:70-77)
_PERM = ((0, 1, 2), (2, 0, 1), (1, 2, 0), (0, 1, 2), (2, 0, 1), (1, 2, 0))


def handler_code(handler_id: int, face: int) -> int:
    return NEIGHBOR_CUSTOM_BASE - (handler_id * 6 + face)


def decode_handler(pc):
    """(handler_id, face) arrays from pc codes (garbage for pc > -9)."""
    v = NEIGHBOR_CUSTOM_BASE - pc
    return v // 6, v % 6


class BoundaryHandler:
    """Base: subclasses define init_state() and apply()."""

    def init_state(self, n_species: int):
        return jnp.zeros((0,), jnp.int32)

    def apply(self, key, b, mask, face, f, g: Grid, sid: int, hstate,
              step=None):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class MaxwellianReflux(BoundaryHandler):
    """ut_para/ut_perp per species id (normalized thermal momenta)."""

    ut_para: Tuple[float, ...]
    ut_perp: Tuple[float, ...]

    def apply(self, key, b, mask, face, f, g: Grid, sid: int, hstate,
              step=None):
        n = b["q"].shape[0]
        utpa = jnp.float32(self.ut_para[sid])
        utpe = jnp.float32(self.ut_perp[sid])
        k1, k2, k3 = jax.random.split(key, 3)
        mu = jax.random.uniform(k1, (n,), jnp.float32,
                                minval=1e-38, maxval=1.0)
        u0 = utpa * jnp.sqrt(-jnp.log(mu))           # flux-weighted parallel
        u0 = u0 * jnp.where(face < 3, SQRT2, -SQRT2)  # into the domain
        u1 = utpe * jax.random.normal(k2, (n,), jnp.float32)
        u2 = utpe * jax.random.normal(k3, (n,), jnp.float32)

        perm = jnp.asarray(_PERM, jnp.int32)[face]    # (n, 3)
        us = jnp.stack([u0, u1, u2], axis=-1)
        ux = jnp.take_along_axis(us, perm[:, 0:1], axis=1)[:, 0]
        uy = jnp.take_along_axis(us, perm[:, 1:2], axis=1)[:, 0]
        uz = jnp.take_along_axis(us, perm[:, 2:3], axis=1)[:, 0]

        # age-consistent residual displacement (maxwellian_reflux.c:128-152)
        dpx = g.dx * b["mdx"]
        dpy = g.dy * b["mdy"]
        dpz = g.dz * b["mdz"]
        old_u2 = b["ux"] ** 2 + b["uy"] ** 2 + b["uz"] ** 2
        new_u2 = ux * ux + uy * uy + uz * uz
        ratio = jnp.sqrt(
            ((1.0 + old_u2) * (dpx * dpx + dpy * dpy + dpz * dpz))
            / ((1.0 + new_u2) * (1e-38 + old_u2)))

        upd = dict(
            ux=jnp.where(mask, ux, b["ux"]),
            uy=jnp.where(mask, uy, b["uy"]),
            uz=jnp.where(mask, uz, b["uz"]),
            mdx=jnp.where(mask, ux * ratio * g.rdx, b["mdx"]),
            mdy=jnp.where(mask, uy * ratio * g.rdy, b["mdy"]),
            mdz=jnp.where(mask, uz * ratio * g.rdz, b["mdz"]),
            pc=jnp.where(mask, PC_EXHAUSTED, b["pc"]),
        )
        b = {**b, **upd}
        return b, f, hstate, jnp.zeros((n,), bool)   # no kills


@dataclasses.dataclass(frozen=True)
class AbsorbTally(BoundaryHandler):
    """Absorb + per-species tally (absorb_tally.c)."""

    n_species: int

    def init_state(self, n_species: int):
        return jnp.zeros((self.n_species,), jnp.int32)

    def apply(self, key, b, mask, face, f, g: Grid, sid: int, hstate,
              step=None):
        f = accumulate_rhob(f, g, b["vox"], b["q"], b["dx"], b["dy"],
                            b["dz"], mask)
        hstate = hstate.at[sid].add(jnp.sum(mask).astype(jnp.int32))
        b = {**b, "pc": jnp.where(mask, 0, b["pc"])}
        return b, f, hstate, mask                     # kill absorbed


@dataclasses.dataclass(frozen=True)
class LinkBoundary(BoundaryHandler):
    """Absorb + record (voxel, q) of each absorbed particle in a ring
    buffer (capacity static); the host drains it to ``link.<rank>`` ASCII
    files (link.c:17-120)."""

    capacity: int = 4096

    def init_state(self, n_species: int):
        return dict(
            count=jnp.zeros((), jnp.int32),
            vox=jnp.zeros((self.capacity,), jnp.int32),
            q=jnp.zeros((self.capacity,), jnp.float32),
            step=jnp.zeros((self.capacity,), jnp.int32),
        )

    def apply(self, key, b, mask, face, f, g: Grid, sid: int, hstate,
              step=None):
        f = accumulate_rhob(f, g, b["vox"], b["q"], b["dx"], b["dy"],
                            b["dz"], mask)
        pos = hstate["count"] + jnp.cumsum(mask.astype(jnp.int32)) - 1
        slot = jnp.where(mask, pos % self.capacity, self.capacity)
        step_v = (jnp.zeros_like(b["vox"]) if step is None
                  else jnp.broadcast_to(jnp.int32(step), b["vox"].shape))
        hstate = dict(
            count=hstate["count"] + jnp.sum(mask).astype(jnp.int32),
            vox=hstate["vox"].at[slot].set(b["vox"], mode="drop"),
            q=hstate["q"].at[slot].set(b["q"], mode="drop"),
            step=hstate["step"].at[slot].set(step_v, mode="drop"),
        )
        b = {**b, "pc": jnp.where(mask, 0, b["pc"])}
        return b, f, hstate, mask


def drain_link_file(hstate, fname):
    """Write the recorded absorptions as ASCII, oldest first (one line per
    particle: step voxel q — link.c appends per hit, so a wrapped ring
    must drain in arrival order, not slot order)."""
    count = int(hstate["count"])
    cap = hstate["vox"].shape[0]
    n = min(count, cap)
    start = count - n          # absolute index of the oldest retained hit
    with open(fname, "a") as fh:
        for k in range(n):
            s = (start + k) % cap
            fh.write(f"{int(hstate['step'][s])} {int(hstate['vox'][s])} "
                     f"{float(hstate['q'][s]):e}\n")
    return count
