"""Guard-list processing: absorption, custom handlers, inter-shard particle
migration, and continuation of unfinished streak walks.

TPU re-design of ``boundary_p`` (src/species_advance/standard/boundary_p.c:
77-505): instead of variable-length mover/injector lists, each species
carries per-particle boundary codes (``pc``); each comm round packs
fixed-capacity per-face injector buffers (particle_injector_t analogue,
species_advance.h:48-55), exchanges them with a face ``ppermute``, injects
into free slots and re-runs the streak walker.  Mirrors ``num_comm_round``
(vpic.cxx:17, default 3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import (
    FieldState,
    Grid,
    NEIGHBOR_ABSORB,
    NEIGHBOR_MIGRATE_BASE,
    SpeciesState,
)
from .aux import accumulate_rhob
from .push import PC_EXHAUSTED, WalkState, streak_walk

# injector record: pos(3), u(3), rem(3), q, vox -> packed as dict of arrays


def _compact_indices(mask, k: int, max_np: int):
    """Stable indices of the first k True entries (padded with max_np).
    O(n) prefix-sum compaction (no sort)."""
    k = min(k, mask.shape[0])
    n_arr = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1          # slot per True
    slot = jnp.where(mask & (pos < k), pos, k)            # k = drop sentinel
    sel = jnp.full((k,), max_np, dtype=jnp.int32).at[slot].set(
        jnp.arange(n_arr, dtype=jnp.int32), mode="drop")
    n = jnp.sum(mask).astype(jnp.int32)
    valid = jnp.arange(k, dtype=jnp.int32) < n
    return jnp.where(valid, sel, max_np), n, valid


def _remap_voxel_through_face(g: Grid, vox, face: int):
    """Destination-shard voxel for a particle that left through ``face``:
    same transverse cell coordinates, axis coordinate snapped to the
    entering edge (every shard has identical local dims)."""
    j = vox // g.nxg
    x = vox - j * g.nxg
    z = j // g.nyg
    y = j - z * g.nyg
    axis = face % 3
    n = (g.nx, g.ny, g.nz)[axis]
    # leaving through a high face -> enter at low edge cell (1); low -> n
    new_c = 1 if face >= 3 else n
    coords = [x, y, z]
    coords[axis] = jnp.full_like(coords[axis], new_c)
    return coords[0] + g.nxg * (coords[1] + g.nyg * coords[2])


def process_boundary(sp: SpeciesState, f: FieldState, acc, neighbor,
                     g: Grid, pcomm, max_inj: int, n_walk: int = 4):
    """One boundary round for one species.  Returns (sp, f, acc)."""
    max_np = sp.max_np
    max_inj = min(max_inj, max_np)

    # ---- 1. absorption: deposit rhob at the boundary position, kill ----
    absorbed = sp.pc == NEIGHBOR_ABSORB
    f = accumulate_rhob(f, g, sp.i, sp.q, sp.dx, sp.dy, sp.dz, absorbed)
    sp = sp.replace(
        i=jnp.where(absorbed, -1, sp.i),
        q=jnp.where(absorbed, 0.0, sp.q),
        pc=jnp.where(absorbed, 0, sp.pc),
    )

    # ---- 2. migration: pack per-face injector buffers, exchange, inject --
    if pcomm is not None:
        payloads = {}
        sel_by_face = {}
        for face in range(6):
            code = NEIGHBOR_MIGRATE_BASE - face
            mask = sp.pc == code
            sel, n, valid = _compact_indices(mask, max_inj, max_np)
            sel_by_face[face] = (sel, n, valid)
            safe = jnp.where(valid, sel, 0)
            axis = face % 3
            pos = [sp.dx[safe], sp.dy[safe], sp.dz[safe]]
            # flip the crossing coordinate: leave at +1 -> enter at -1
            pos[axis] = -pos[axis]
            payloads[face] = dict(
                dx=jnp.where(valid, pos[0], 0.0),
                dy=jnp.where(valid, pos[1], 0.0),
                dz=jnp.where(valid, pos[2], 0.0),
                ux=sp.ux[safe], uy=sp.uy[safe], uz=sp.uz[safe],
                q=jnp.where(valid, sp.q[safe], 0.0),
                mdx=sp.mdx[safe], mdy=sp.mdy[safe], mdz=sp.mdz[safe],
                vox=jnp.where(
                    valid,
                    _remap_voxel_through_face(g, sp.i[safe], face),
                    0),
                n=n,
            )
        recv = pcomm.exchange(payloads)

        # kill the migrated particles locally
        mig = sp.pc <= NEIGHBOR_MIGRATE_BASE
        mig = mig & (sp.pc > NEIGHBOR_MIGRATE_BASE - 6)
        sp = sp.replace(
            i=jnp.where(mig, -1, sp.i),
            q=jnp.where(mig, 0.0, sp.q),
            pc=jnp.where(mig, 0, sp.pc),
        )

        # inject received particles into free slots
        for face in range(6):
            r = recv.get(face)
            if r is None:
                continue
            n_inj = r["n"]
            slot = sp.np + jnp.arange(max_inj, dtype=jnp.int32)
            ok = (jnp.arange(max_inj, dtype=jnp.int32) < n_inj) & (slot < max_np)
            tgt = jnp.where(ok, slot, max_np)

            def put(arr, vals):
                return arr.at[tgt].set(vals, mode="drop")

            sp = sp.replace(
                dx=put(sp.dx, r["dx"]), dy=put(sp.dy, r["dy"]),
                dz=put(sp.dz, r["dz"]),
                ux=put(sp.ux, r["ux"]), uy=put(sp.uy, r["uy"]),
                uz=put(sp.uz, r["uz"]),
                q=put(sp.q, r["q"]), i=put(sp.i, r["vox"]),
                mdx=put(sp.mdx, r["mdx"]), mdy=put(sp.mdy, r["mdy"]),
                mdz=put(sp.mdz, r["mdz"]),
                pc=put(sp.pc, jnp.full((max_inj,), PC_EXHAUSTED, jnp.int32)),
                np=jnp.minimum(sp.np + jnp.sum(ok).astype(jnp.int32), max_np),
            )

    # ---- 3. continue unfinished walks (incl. freshly injected) ----
    pending = sp.alive & (sp.pc == PC_EXHAUSTED)
    sel, n, valid = _compact_indices(pending, max_inj, max_np)
    safe = jnp.where(valid, sel, 0)
    st = WalkState(
        pos=jnp.stack([sp.dx[safe], sp.dy[safe], sp.dz[safe]], axis=-1),
        vox=sp.i[safe],
        u=jnp.stack([sp.ux[safe], sp.uy[safe], sp.uz[safe]], axis=-1),
        rem=jnp.stack([sp.mdx[safe], sp.mdy[safe], sp.mdz[safe]], axis=-1),
        q=jnp.where(valid, sp.q[safe], 0.0),
        pcode=jnp.zeros((max_inj,), dtype=jnp.int32),
        active=valid,
    )
    st, acc = streak_walk(st, acc, neighbor, n_walk)

    tgt = jnp.where(valid, sel, max_np)
    pend_new = st.pcode != 0
    sp = sp.replace(
        dx=sp.dx.at[tgt].set(st.pos[:, 0], mode="drop"),
        dy=sp.dy.at[tgt].set(st.pos[:, 1], mode="drop"),
        dz=sp.dz.at[tgt].set(st.pos[:, 2], mode="drop"),
        i=sp.i.at[tgt].set(st.vox, mode="drop"),
        ux=sp.ux.at[tgt].set(st.u[:, 0], mode="drop"),
        uy=sp.uy.at[tgt].set(st.u[:, 1], mode="drop"),
        uz=sp.uz.at[tgt].set(st.u[:, 2], mode="drop"),
        mdx=sp.mdx.at[tgt].set(
            jnp.where(pend_new, st.rem[:, 0], 0.0), mode="drop"),
        mdy=sp.mdy.at[tgt].set(
            jnp.where(pend_new, st.rem[:, 1], 0.0), mode="drop"),
        mdz=sp.mdz.at[tgt].set(
            jnp.where(pend_new, st.rem[:, 2], 0.0), mode="drop"),
        pc=sp.pc.at[tgt].set(st.pcode, mode="drop"),
    )
    return sp, f, acc


def finish_boundary(sp: SpeciesState) -> SpeciesState:
    """After the comm rounds: count and drop still-unresolved movers
    (mirror of the "Ignoring %i unprocessed movers" warning,
    advance.cxx:98-103)."""
    leftover = sp.alive & (sp.pc != 0)
    nm = jnp.sum(leftover).astype(jnp.int32)
    return sp.replace(nm=nm, pc=jnp.zeros_like(sp.pc),
                      mdx=jnp.zeros_like(sp.mdx),
                      mdy=jnp.zeros_like(sp.mdy),
                      mdz=jnp.zeros_like(sp.mdz))
