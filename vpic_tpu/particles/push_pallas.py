"""Fused Pallas push kernel: interpolator gather + Boris push + first
streak segment + current deposition in ONE kernel over sorted particle
blocks.

This is the speed-of-light form of the reference's hot loop
(advance_p.cxx:68-183): both the 18-coefficient gather and the
12-component deposit become one-hot matmuls on the MXU against
lane-windowed slices of VMEM-resident tables, the push math runs on the
VPU in (1,128)-row form, and no per-element gather/scatter touches HBM.

Memory plan (per core):
  interp (24 x nv_pad x 4B)  VMEM resident input
  acc    (16 x nv_pad x 4B)  VMEM resident revisited output
  => usable for nv_pad up to ~100k voxels; larger grids use the unfused
  path (engine/step.py auto-selects).

The kernel handles only in-window particles (sorted order guarantees
nearly all); out-of-window lanes are flagged and re-done by the caller
via the reference-equivalent XLA path.  Cell-crossing resolution (the
neighbor table part of move_p.c:112-133) stays outside — the kernel
reports (stype, dir) and the caller applies the crossing/reflection.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import IP

LANE = 128
ONE_THIRD = 1.0 / 3.0
TWO_FIFTEENTHS = 2.0 / 15.0

# pout row layout
RX, RY, RZ, RUX, RUY, RUZ, RRX, RRY, RRZ, RDONE, RTYPE, RDIR, ROK = range(13)
NROWS = 16


def _round_up(x, m):
    return (x + m - 1) // m * m


def _kernel(starts_ref, params_ref, loc_ref, pstate_ref, interp_ref,
            acc_ref, pout_ref, *, window):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    start = starts_ref[i]
    qdt_2mc = params_ref[0]
    cdt = (params_ref[1], params_ref[2], params_ref[3])

    one = jnp.float32(1.0)
    big = jnp.float32(3.4e38)
    rows = loc_ref.shape[0]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (window, LANE), 0)
    win = interp_ref[:, pl.ds(pl.multiple_of(start, LANE), window)]  # (18,W)
    blk = jnp.zeros((12, window), jnp.float32)

    for r in range(rows):
        loc_row = loc_ref[r, :][None, :]                   # (1, 128)
        inb = (loc_row >= 0) & (loc_row < window)
        ohT = ((loc_row == iota_w) & inb).astype(jnp.float32)  # (W, 128)

        # ---- gather: (18, W) x (W, 128) -> (18, 128) on the MXU ----
        C = jax.lax.dot_general(
            win, ohT, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

        ps = pstate_ref[:, r * LANE:(r + 1) * LANE]        # (7, 128)
        dx, dy, dz = ps[0:1], ps[1:2], ps[2:3]
        ux, uy, uz = ps[3:4], ps[4:5], ps[5:6]
        q = ps[6:7]

        c = lambda k: C[k:k + 1, :]
        # interpolate E/B (advance_p.cxx:74-82)
        hax = qdt_2mc * ((c(IP["ex"]) + dy * c(IP["dexdy"]))
                         + dz * (c(IP["dexdz"]) + dy * c(IP["d2exdydz"])))
        hay = qdt_2mc * ((c(IP["ey"]) + dz * c(IP["deydz"]))
                         + dx * (c(IP["deydx"]) + dz * c(IP["d2eydzdx"])))
        haz = qdt_2mc * ((c(IP["ez"]) + dx * c(IP["dezdx"]))
                         + dy * (c(IP["dezdy"]) + dx * c(IP["d2ezdxdy"])))
        cbx = c(IP["cbx"]) + dx * c(IP["dcbxdx"])
        cby = c(IP["cby"]) + dy * c(IP["dcbydy"])
        cbz = c(IP["cbz"]) + dz * c(IP["dcbzdz"])

        # Boris (advance_p.cxx:87-105)
        ux = ux + hax
        uy = uy + hay
        uz = uz + haz
        v0 = qdt_2mc * jax.lax.rsqrt(one + (ux * ux + (uy * uy + uz * uz)))
        v1 = cbx * cbx + (cby * cby + cbz * cbz)
        v2 = (v0 * v0) * v1
        v3 = v0 * (one + v2 * (jnp.float32(ONE_THIRD)
                               + v2 * jnp.float32(TWO_FIFTEENTHS)))
        v4 = v3 / (one + v1 * (v3 * v3))
        v4 = v4 + v4
        w0 = ux + v3 * (uy * cbz - uz * cby)
        w1 = uy + v3 * (uz * cbx - ux * cbz)
        w2 = uz + v3 * (ux * cby - uy * cbx)
        ux = ux + v4 * (w1 * cbz - w2 * cby)
        uy = uy + v4 * (w2 * cbx - w0 * cbz)
        uz = uz + v4 * (w0 * cby - w1 * cbx)
        ux = ux + hax
        uy = uy + hay
        uz = uz + haz

        v0 = jax.lax.rsqrt(one + (ux * ux + (uy * uy + uz * uz)))
        rx = (ux * cdt[0]) * v0
        ry = (uy * cdt[1]) * v0
        rz = (uz * cdt[2]) * v0

        # first streak segment (move_p.c:34-71)
        pos = (dx, dy, dz)
        rem = (rx, ry, rz)
        sdir = tuple(jnp.where(rr > 0, one, -one) for rr in rem)
        frac = tuple(jnp.where(rr == 0, big, (dd - pp) / rr)
                     for rr, dd, pp in zip(rem, sdir, pos))
        t3 = jnp.full_like(q, 2.0)
        stype = jnp.full_like(q, 3.0)
        for a in range(3):
            hit = frac[a] < t3
            t3 = jnp.where(hit, frac[a], t3)
            stype = jnp.where(hit, jnp.float32(a), stype)
        t3 = t3 * jnp.float32(0.5)
        sd = tuple(rr * t3 for rr in rem)
        sm = tuple(pp + ss for pp, ss in zip(pos, sd))

        q_eff = q * inb.astype(jnp.float32)
        v5 = q_eff * sd[0] * sd[1] * sd[2] * jnp.float32(ONE_THIRD)
        contrib = []
        for X, Y, Z in ((0, 1, 2), (1, 2, 0), (2, 0, 1)):
            vX = q_eff * sd[X]
            my, mz = sm[Y], sm[Z]
            contrib += [
                vX * (one - my) * (one - mz) + v5,
                vX * (one + my) * (one - mz) - v5,
                vX * (one - my) * (one + mz) - v5,
                vX * (one + my) * (one + mz) + v5,
            ]
        contrib = jnp.concatenate(contrib, axis=0)          # (12, 128)
        blk = blk + jax.lax.dot_general(
            contrib, ohT, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

        rem_o = tuple(rr - ss for rr, ss in zip(rem, sd))
        pos_o = tuple(pp + 2.0 * ss for pp, ss in zip(pos, sd))
        done = (stype == 3.0).astype(jnp.float32)
        dir_hit = jnp.zeros_like(q)
        for a in range(3):
            dir_hit = jnp.where(stype == jnp.float32(a), sdir[a], dir_hit)

        out = jnp.concatenate([
            pos_o[0], pos_o[1], pos_o[2], ux, uy, uz,
            rem_o[0], rem_o[1], rem_o[2],
            done, stype, dir_hit, inb.astype(jnp.float32),
            jnp.zeros((3, LANE), jnp.float32),
        ], axis=0)                                          # (16, 128)
        pout_ref[:, r * LANE:(r + 1) * LANE] = out

    idx = pl.multiple_of(start, LANE)
    acc_ref[:, pl.ds(idx, window)] += blk


@functools.partial(jax.jit,
                   static_argnames=("nv", "block", "window"))
def fused_push_deposit(vox, pstate_t, interp_t, params, nv: int,
                       block: int = 1024, window: int = 512):
    """Run the fused kernel.

    vox: (np,) int32 (near-)sorted voxels (dead lanes must carry a valid
         sorted position or be masked out via q=0 in pstate).
    pstate_t: (7, np) float32 rows [dx,dy,dz,ux,uy,uz,q].
    interp_t: (18, nv_pad) float32 (transposed interpolator table).
    params: (4,) float32 [qdt_2mc, cdt_dx, cdt_dy, cdt_dz].

    Returns (acc_t (12, nv_pad), pout (16, np), in_window (np,) bool).
    """
    n = vox.shape[0]
    npad = _round_up(max(n, block), block)
    nb = npad // block
    nv_pad = interp_t.shape[1]

    if npad != n:
        vox = jnp.concatenate([vox, jnp.zeros((npad - n,), jnp.int32)])
        pstate_t = jnp.concatenate(
            [pstate_t, jnp.zeros((7, npad - n), jnp.float32)], axis=1)

    starts_raw = vox[::block]
    starts = jnp.minimum((starts_raw // LANE) * LANE,
                         max(nv_pad - window, 0)).astype(jnp.int32)
    loc = vox - jnp.repeat(starts, block)
    in_window = (loc >= 0) & (loc < window)
    loc = jnp.where(in_window, loc, -1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block // LANE, LANE),
                         lambda i, s, p: (i, np.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((7, block), lambda i, s, p: (np.int32(0), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((18, nv_pad),
                         lambda i, s, p: (np.int32(0), np.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((12, nv_pad),
                         lambda i, s, p: (np.int32(0), np.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NROWS, block), lambda i, s, p: (np.int32(0), i),
                         memory_space=pltpu.VMEM),
        ],
    )
    acc_t, pout = pl.pallas_call(
        functools.partial(_kernel, window=window),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((12, nv_pad), jnp.float32),
            jax.ShapeDtypeStruct((NROWS, npad), jnp.float32),
        ],
    )(starts, params, loc.reshape(nb * (block // LANE), LANE),
      pstate_t, interp_t)

    return acc_t, pout[:, :n], in_window[:n]


def fused_vmem_ok(nv: int, window: int = 512) -> bool:
    """Whether the resident interp+acc tables fit comfortably in VMEM."""
    nv_pad = _round_up(nv + 1, LANE)
    bytes_needed = (24 + 16) * nv_pad * 4  # sublane-padded f32 tables
    return bytes_needed < 11 * 2 ** 20
