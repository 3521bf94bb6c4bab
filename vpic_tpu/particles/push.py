"""Particle push + charge-conserving current deposition.

TPU re-design of the reference's hot loop:

- ``advance_p`` (src/species_advance/standard/advance_p.cxx:68-183): gather
  18 interpolation coefficients, half-E kick, 6th-order-accurate Boris
  rotation (Taylor tan expansion, :91-96), half-E kick, relativistic
  displacement, in-bounds check, 12-component quadrant current deposition
  with the q*ux*uy*uz/3 charge-conservation correction (:137-163).
- ``move_p`` (src/species_advance/standard/move_p.c:20-136): the
  streak-splitting cell walker for particles that leave their voxel.

Re-design decisions:
- One fused vectorized phase over all particles (the in-bounds fast path),
  then a fixed-capacity "mover buffer" (the SoA analogue of
  ``particle_mover_t``, species_advance.h:39-42) gathered by stable argsort
  compaction; the walker runs a *bounded* number of streak iterations on the
  buffer only (under the Courant limit a particle crosses at most one face
  per axis, so 4 segments suffice; extra rounds mirror num_comm_round).
- Deposition accumulates into a dense (nv, 12) float32 accumulator with
  XLA scatter-add (deterministic), replacing the per-pipeline accumulator
  replicas + reduce_accumulators (sf_interface.h:60-77).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.types import (
    Grid,
    IP,
    NEIGHBOR_REFLECT,
    SpeciesState,
)

ONE_THIRD = 1.0 / 3.0
TWO_FIFTEENTHS = 2.0 / 15.0

# pcode values (per-particle boundary status)
PC_DONE = 0          # settled in a voxel
PC_EXHAUSTED = 1     # walker ran out of iterations (mirror of mover overflow)
# negative: the neighbor-table boundary code that stopped the walk


def interpolate_fields(ip, dx, dy, dz):
    """E (first-order in-plane expansion) and cB (linear) at the particle
    (advance_p.cxx:74-82).  ``ip`` is the gathered (n, 18) coefficient rows."""
    c = lambda k: ip[:, IP[k]]
    ex = (c("ex") + dy * c("dexdy")) + dz * (c("dexdz") + dy * c("d2exdydz"))
    ey = (c("ey") + dz * c("deydz")) + dx * (c("deydx") + dz * c("d2eydzdx"))
    ez = (c("ez") + dx * c("dezdx")) + dy * (c("dezdy") + dx * c("d2ezdxdy"))
    cbx = c("cbx") + dx * c("dcbxdx")
    cby = c("cby") + dy * c("dcbydy")
    cbz = c("cbz") + dz * c("dcbzdz")
    return ex, ey, ez, cbx, cby, cbz


def boris_rotation(ux, uy, uz, cbx, cby, cbz, v0):
    """The Boris rotation given v0 = (q dt'/2mc)/gamma (advance_p.cxx:91-102);
    v3 = v0*(1 + v2*(1/3 + v2*2/15)) is the tan(theta/2)/(theta/2) Taylor
    correction making the rotation 6th-order accurate."""
    one = jnp.float32(1.0)
    v1 = cbx * cbx + (cby * cby + cbz * cbz)
    v2 = (v0 * v0) * v1
    v3 = v0 * (one + v2 * (jnp.float32(ONE_THIRD) + v2 * jnp.float32(TWO_FIFTEENTHS)))
    v4 = v3 / (one + v1 * (v3 * v3))
    v4 = v4 + v4
    w0 = ux + v3 * (uy * cbz - uz * cby)
    w1 = uy + v3 * (uz * cbx - ux * cbz)
    w2 = uz + v3 * (ux * cby - uy * cbx)
    ux = ux + v4 * (w1 * cbz - w2 * cby)
    uy = uy + v4 * (w2 * cbx - w0 * cbz)
    uz = uz + v4 * (w0 * cby - w1 * cbx)
    return ux, uy, uz


def deposit12(q, sd, sm):
    """Quadrant current contributions for a streak with half-displacement
    ``sd`` (n,3) and midpoint ``sm`` (n,3): the ACCUMULATE_J macro
    (advance_p.cxx:140-158), all three axis permutations -> (n, 12)."""
    one = jnp.float32(1.0)
    v5 = q * sd[:, 0] * sd[:, 1] * sd[:, 2] * jnp.float32(ONE_THIRD)
    cols = []
    for X, Y, Z in ((0, 1, 2), (1, 2, 0), (2, 0, 1)):
        vX = q * sd[:, X]
        my, mz = sm[:, Y], sm[:, Z]
        a0 = vX * (one - my) * (one - mz) + v5
        a1 = vX * (one + my) * (one - mz) - v5
        a2 = vX * (one - my) * (one + mz) - v5
        a3 = vX * (one + my) * (one + mz) + v5
        cols += [a0, a1, a2, a3]
    return jnp.stack(cols, axis=-1)


class WalkState(NamedTuple):
    pos: jax.Array    # (m, 3) cell-relative position
    vox: jax.Array    # (m,) voxel
    u: jax.Array      # (m, 3) momentum (mutated by reflections)
    rem: jax.Array    # (m, 3) remaining half-displacement
    q: jax.Array      # (m,)
    pcode: jax.Array  # (m,) int32
    active: jax.Array # (m,) bool


def streak_walk(st: WalkState, acc, neighbor, n_iter: int):
    """Run up to ``n_iter`` streak-split segments per particle, depositing
    each segment's quadrant currents (move_p.c:34-134)."""
    big = jnp.float32(3.4e38)
    one = jnp.float32(1.0)

    def body(_, carry):
        st, acc = carry
        pos, vox, u, rem, q, pcode, active = st

        sdir = jnp.where(rem > 0, one, -one)
        frac2 = jnp.where(rem == 0, big, (sdir - pos) / rem)
        # sequential min with later-axis tie priority (move_p.c:59-62)
        v3 = jnp.full_like(q, 2.0)
        stype = jnp.full_like(vox, 3)
        for a in range(3):
            hit = frac2[:, a] < v3
            v3 = jnp.where(hit, frac2[:, a], v3)
            stype = jnp.where(hit, a, stype)
        v3 = v3 * jnp.float32(0.5)

        sd = rem * v3[:, None]
        sm = pos + sd

        q_eff = jnp.where(active, q, jnp.float32(0.0))
        contrib = deposit12(q_eff, sd, sm)
        acc = acc.at[jnp.where(active, vox, 0)].add(
            contrib, mode="promise_in_bounds")

        rem_new = rem - sd
        pos_new = pos + 2.0 * sd

        done = stype == 3
        # face = type + 3*(dir>0)  (move_p.c:123)
        axis_oh = stype[:, None] == jnp.arange(3, dtype=stype.dtype)[None, :]
        dir_hit = jnp.sum(jnp.where(axis_oh, sdir, 0.0), axis=1)
        face = stype + jnp.where(dir_hit > 0, 3, 0)
        nb = neighbor[vox, jnp.where(done, 0, face) % 6]

        crossed_local = (~done) & (nb >= 0)
        reflected = (~done) & (nb == NEIGHBOR_REFLECT)
        stopped = (~done) & (nb < 0) & (nb != NEIGHBOR_REFLECT)

        # local crossing: switch voxel, flip the crossing coordinate
        pos_cross = jnp.where(axis_oh, -dir_hit[:, None], pos_new)
        # boundary hit: place exactly on the boundary
        pos_stop = jnp.where(axis_oh, dir_hit[:, None], pos_new)

        pos_out = jnp.where(
            (crossed_local & active)[:, None], pos_cross,
            jnp.where(((reflected | stopped) & active)[:, None], pos_stop,
                      pos_new))
        vox_out = jnp.where(crossed_local & active, nb, vox)
        u_out = jnp.where((reflected & active)[:, None],
                          jnp.where(axis_oh, -u, u), u)
        rem_out = jnp.where((reflected & active)[:, None],
                            jnp.where(axis_oh, -rem_new, rem_new), rem_new)

        pcode_out = jnp.where(stopped & active, nb, pcode)
        active_out = active & ~(done | stopped)

        st = WalkState(
            pos=jnp.where(active[:, None], pos_out, pos),
            vox=jnp.where(active, vox_out, vox),
            u=jnp.where(active[:, None], u_out, u),
            rem=jnp.where(active[:, None], rem_out, rem),
            q=q,
            pcode=jnp.where(active, pcode_out, pcode),
            active=active_out,
        )
        return st, acc

    st, acc = jax.lax.fori_loop(0, n_iter, body, (st, acc), unroll=True)
    # anything still active exhausted its iterations
    pcode = jnp.where(st.active, jnp.int32(PC_EXHAUSTED), st.pcode)
    return st._replace(pcode=pcode, active=jnp.zeros_like(st.active)), acc


def advance_p(sp: SpeciesState, interp, acc, neighbor, g: Grid,
              max_nm: int | None = None, n_walk: int = 4):
    """One particle push for a whole species.

    Returns (updated species, accumulator).  Out-of-bounds particles finish
    in the mover buffer; unresolved boundary interactions are stored in
    (mdx,mdy,mdz, pc-encoded-in-nm...) for the boundary rounds.
    """
    if max_nm is None:
        max_nm = max(1, sp.max_np // 2)

    qdt_2mc = (0.5 * sp.q_m * g.dt / g.cvac).astype(jnp.float32)
    cdt_dx = jnp.float32(g.cvac * g.dt * g.rdx)
    cdt_dy = jnp.float32(g.cvac * g.dt * g.rdy)
    cdt_dz = jnp.float32(g.cvac * g.dt * g.rdz)
    one = jnp.float32(1.0)

    dx, dy, dz, vox = sp.dx, sp.dy, sp.dz, sp.i
    ip = interp[vox]

    ex, ey, ez, cbx, cby, cbz = interpolate_fields(ip, dx, dy, dz)
    hax, hay, haz = qdt_2mc * ex, qdt_2mc * ey, qdt_2mc * ez

    ux = sp.ux + hax
    uy = sp.uy + hay
    uz = sp.uz + haz
    v0 = qdt_2mc / jnp.sqrt(one + (ux * ux + (uy * uy + uz * uz)))
    ux, uy, uz = boris_rotation(ux, uy, uz, cbx, cby, cbz, v0)
    ux = ux + hax
    uy = uy + hay
    uz = uz + haz

    # normalized half-displacement (advance_p.cxx:109-116)
    v0 = one / jnp.sqrt(one + (ux * ux + (uy * uy + uz * uz)))
    ddx = (ux * cdt_dx) * v0
    ddy = (uy * cdt_dy) * v0
    ddz = (uz * cdt_dz) * v0

    midx, midy, midz = dx + ddx, dy + ddy, dz + ddz
    newx, newy, newz = midx + ddx, midy + ddy, midz + ddz

    alive = sp.alive
    inb = (
        (newx <= one) & (newy <= one) & (newz <= one)
        & (-newx <= one) & (-newy <= one) & (-newz <= one)
    )
    outb = alive & ~inb

    # ---- fast path: deposit all in-bounds particles in one pass ----
    q_eff = jnp.where(alive & inb, sp.q, jnp.float32(0.0))
    sd = jnp.stack([ddx, ddy, ddz], axis=-1)
    sm = jnp.stack([midx, midy, midz], axis=-1)
    acc = acc.at[jnp.where(alive & inb, vox, 0)].add(
        deposit12(q_eff, sd, sm), mode="promise_in_bounds")

    dx = jnp.where(inb, newx, dx)
    dy = jnp.where(inb, newy, dy)
    dz = jnp.where(inb, newz, dz)

    # ---- mover buffer: O(n) prefix-sum compaction of out-of-bounds ----
    max_nm = min(max_nm, sp.max_np)
    pos = jnp.cumsum(outb.astype(jnp.int32)) - 1
    slot = jnp.where(outb & (pos < max_nm), pos, max_nm)
    sel = jnp.full((max_nm,), sp.max_np, dtype=jnp.int32).at[slot].set(
        jnp.arange(sp.max_np, dtype=jnp.int32), mode="drop")
    n_out = jnp.sum(outb).astype(jnp.int32)
    buf_active = jnp.arange(max_nm, dtype=jnp.int32) < jnp.minimum(
        n_out, max_nm)
    sel = jnp.where(buf_active, sel, 0)

    # overflow particles (beyond buffer capacity) are deferred to the
    # boundary rounds with their full pending displacement — an improvement
    # over the reference's drop-with-WARNING (advance_p.cxx:463-465)
    ignored = outb & (pos >= max_nm)

    st = WalkState(
        pos=jnp.stack([dx[sel], dy[sel], dz[sel]], axis=-1),
        vox=vox[sel],
        u=jnp.stack([ux[sel], uy[sel], uz[sel]], axis=-1),
        rem=jnp.stack([ddx[sel], ddy[sel], ddz[sel]], axis=-1),
        q=sp.q[sel],
        pcode=jnp.zeros((max_nm,), dtype=jnp.int32),
        active=buf_active,
    )
    st, acc = streak_walk(st, acc, neighbor, n_walk)

    # scatter walker results back (drop writes for inactive buffer slots)
    tgt = jnp.where(buf_active, sel, sp.max_np)
    dx = dx.at[tgt].set(st.pos[:, 0], mode="drop")
    dy = dy.at[tgt].set(st.pos[:, 1], mode="drop")
    dz = dz.at[tgt].set(st.pos[:, 2], mode="drop")
    vox = vox.at[tgt].set(st.vox, mode="drop")
    ux = ux.at[tgt].set(st.u[:, 0], mode="drop")
    uy = uy.at[tgt].set(st.u[:, 1], mode="drop")
    uz = uz.at[tgt].set(st.u[:, 2], mode="drop")

    # pending boundary interactions -> mover fields
    pend = st.pcode != PC_DONE
    mdx = jnp.where(ignored, ddx, 0.0).at[tgt].set(
        jnp.where(pend, st.rem[:, 0], 0.0), mode="drop")
    mdy = jnp.where(ignored, ddy, 0.0).at[tgt].set(
        jnp.where(pend, st.rem[:, 1], 0.0), mode="drop")
    mdz = jnp.where(ignored, ddz, 0.0).at[tgt].set(
        jnp.where(pend, st.rem[:, 2], 0.0), mode="drop")
    pc = jnp.where(ignored, jnp.int32(PC_EXHAUSTED), 0).at[tgt].set(
        st.pcode, mode="drop")

    nm = (jnp.sum(pend & buf_active) + jnp.sum(ignored)).astype(jnp.int32)

    sp = sp.replace(dx=dx, dy=dy, dz=dz, i=vox, ux=ux, uy=uy, uz=uz,
                    mdx=mdx, mdy=mdy, mdz=mdz, pc=pc, nm=nm)
    return sp, acc


def center_p(sp: SpeciesState, interp, g: Grid) -> SpeciesState:
    """u_{-1/2} -> u_0: half-E kick then half Boris rotation
    (center_p.cxx:13-70)."""
    qdt_2mc = (0.5 * sp.q_m * g.dt / g.cvac).astype(jnp.float32)
    return _center(sp, interp, qdt_2mc, 0.5 * qdt_2mc, kick_first=True)


def uncenter_p(sp: SpeciesState, interp, g: Grid) -> SpeciesState:
    """u_0 -> u_{-1/2}: backward half rotation then backward half kick
    (uncenter_p.cxx:14-70)."""
    qdt_2mc = (0.5 * sp.q_m * g.dt / g.cvac).astype(jnp.float32)
    return _center(sp, interp, -qdt_2mc, -0.5 * qdt_2mc, kick_first=False)


def _center(sp, interp, kick, rot, kick_first):
    one = jnp.float32(1.0)
    ip = interp[sp.i]
    ex, ey, ez, cbx, cby, cbz = interpolate_fields(ip, sp.dx, sp.dy, sp.dz)
    hax, hay, haz = kick * ex, kick * ey, kick * ez
    ux, uy, uz = sp.ux, sp.uy, sp.uz
    if kick_first:
        ux, uy, uz = ux + hax, uy + hay, uz + haz
    v0 = rot / jnp.sqrt(one + (ux * ux + (uy * uy + uz * uz)))
    ux, uy, uz = boris_rotation(ux, uy, uz, cbx, cby, cbz, v0)
    if not kick_first:
        ux, uy, uz = ux + hax, uy + hay, uz + haz
    return sp.replace(ux=ux, uy=uy, uz=uz)


def energy_p(sp: SpeciesState, interp, g: Grid):
    """Local kinetic energy of a species (energy_p.cxx:31-46 + :124-157):
    sum q * |u+halfkick|^2/(sqrt(1+|u|^2)+1), double accumulation; caller
    psums and scales by cvac^2/q_m."""
    one = jnp.float32(1.0)
    qdt_2mc = (0.5 * sp.q_m * g.dt / g.cvac).astype(jnp.float32)
    ip = interp[sp.i]
    ex, ey, ez, _, _, _ = interpolate_fields(ip, sp.dx, sp.dy, sp.dz)
    v0 = sp.ux + qdt_2mc * ex
    v1 = sp.uy + qdt_2mc * ey
    v2 = sp.uz + qdt_2mc * ez
    usq = v0 * v0 + v1 * v1 + v2 * v2
    ke = usq / (jnp.sqrt(one + usq) + one)
    en = jnp.sum(jnp.where(sp.alive,
                           ke.astype(jnp.float64) * sp.q.astype(jnp.float64),
                           0.0))
    return en


def finish_energy_p(sp: SpeciesState, g: Grid, global_en):
    return (g.cvac * g.cvac / sp.q_m).astype(jnp.float64) * global_en
