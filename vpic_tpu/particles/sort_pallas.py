"""O(n) near-sorted re-sort for packed species (the TPU answer to the
reference's counting sort, src/species_advance/standard/sort_p.c:16-102).

The multi-operand bitonic ``lax.sort`` pays O(n log^2 n) network passes
over 7-9 payload rows every resort — the single biggest device-time line
at bench scale (SCALING.md).  But between sorts the array is only
PERTURBED: lanes never move, only the keys of the few cell-crossers
change.  Carrying ``key0`` (the sorted key snapshot from the last sort)
makes the crossed set exact: ``movers = key != key0`` (2-10% of lanes),
and the untouched complement — the RESIDUAL — is still sorted.  A full
sort is then a two-run merge:

  1. extract + bitonic-sort the movers (small: M_cap lanes),
  2. per-key cumulative tables (cum_res/cum_mov/cum_tot) give an exact
     merge-path partition: output block j owns residual ranks
     [rlo_j, rhi_j) and mover ranks [mlo_j, mhi_j) with
     rlo_j + mlo_j = j*B (ties: residual first),
  3. one Pallas pass assembles each output block: the residual lane
     window and the mover run are merged by LOCAL one-hot rank
     arithmetic over the block's small key span (hist -> cumsum ->
     one-hot gather, all MXU/VPU) and written with an exact bf16x3
     one-hot permutation matmul (the push kernel's dot3 trick).

Everything stays O(n): no scatter, no per-lane table gather, no global
network.  The per-key tables come from searchsorted over SORTED arrays
only (movers) plus the carried ``ctot`` table (the previous sort's
cum_tot IS this sort's key0 cumulative — no O(n) histogram ever runs in
steady state).  Decks whose geometry defeats the static provisioning
(mover overflow, wide key spans, sparse residual windows) fall back to
the bitonic inside a ``lax.cond`` — never wrong, only slower.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def _split3(v):
    """Exact 3-way bf16 split (push_pallas.split3): v == hi+mid+lo."""
    hi = v.astype(jnp.bfloat16)
    r1 = v - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _dot3(v, ohT, m):
    """Exact f32 (m, K) x 0/1 (K, N) matmul via the M-batched bf16x3
    recombine (bitwise equal to the f32 dot)."""
    cat = jnp.concatenate(_split3(v), axis=0)
    D = jax.lax.dot_general(cat, ohT, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (D[0:m] + D[m:2 * m]) + D[2 * m:3 * m]


def _cumsum_lanes(x):
    """Inclusive cumsum along the last (lane) axis of a (1, L) block —
    log2(L) shift-and-add passes (Mosaic-safe; jnp.cumsum lowers poorly
    on the lane axis)."""
    L = x.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    s = 1
    while s < L:
        # shift must be an explicit int32: a Python int traces as i64
        # under the package-wide x64 config, which tpu.dynamic_rotate
        # rejects
        sh = pltpu.roll(x, jnp.int32(s), axis=len(x.shape) - 1)
        x = x + jnp.where(idx >= s, sh, jnp.zeros_like(x))
        s *= 2
    return x


def _assemble_kernel(meta_ref, res_ref, msk_ref, mov_ref, out_ref,
                     flag_ref, *, B, W, WIN_R, WIN_M):
    """Assemble one sorted output block (8, B) from its residual lane
    window (8, WIN_R) and mover run window (8, WIN_M).

    meta rows (int32, per block): 0 rstart (residual rank of window
    lane 0), 1 rlo, 2 rhi, 3 mlo, 4 mhi, 5 d_m (mover in-window offset),
    6 kstart (block key-span base in kernel key space)."""
    i = pl.program_id(0)
    rstart = meta_ref[0, i]
    rlo = meta_ref[1, i]
    rhi = meta_ref[2, i]
    mlo = meta_ref[3, i]
    mhi = meta_ref[4, i]
    d_m = meta_ref[5, i]
    kstart = meta_ref[6, i]

    res = res_ref[0]                                  # (8, WIN_R)
    mov = mov_ref[0]                                  # (8, WIN_M)
    is_res = msk_ref[0] > 0.5                         # (1, WIN_R)

    # global residual rank per window lane (exclusive running count)
    cnt = _cumsum_lanes(is_res.astype(jnp.int32))     # inclusive
    grank = rstart + cnt - is_res.astype(jnp.int32)   # exclusive + base
    own_r = is_res & (grank >= rlo) & (grank < rhi)

    lane_m = jax.lax.broadcasted_iota(jnp.int32, (1, WIN_M), 1)
    gm = mlo - d_m + lane_m                           # global mover rank
    own_m = (lane_m >= d_m) & (gm < mhi)

    # keys relative to the block's span base
    kr = (res[7:8] + 0.5).astype(jnp.int32) - kstart
    km = (mov[7:8] + 0.5).astype(jnp.int32) - kstart
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    # literals must be explicitly int32: a weak Python int traces as an
    # int64 scalar whose int64->int32 convert cycles Mosaic's lowering
    neg1 = jnp.int32(-1)
    ohr = (jnp.where(own_r, kr, neg1) == iota_w)      # (W, WIN_R) bool
    ohm = (jnp.where(own_m, km, neg1) == iota_w)      # (W, WIN_M)

    # local two-run merge ranks over the key span:
    #   residual lane (key v): movers_before = # owned movers key < v
    #   mover lane  (key v): res_before     = # owned residual key <= v
    # f32 reductions throughout: x64 is enabled package-wide, and
    # jnp.sum upcasts integer accumulators to int64, which Mosaic cannot
    # lower; every count here is <= win lanes << 2^24, f32-exact
    hist_m = jnp.sum(ohm.astype(jnp.float32), axis=1, keepdims=True)
    hist_r = jnp.sum(ohr.astype(jnp.float32), axis=1, keepdims=True)
    cumm = _cumsum_lanes(hist_m.reshape(1, W))        # inclusive (1, W)
    cumr = _cumsum_lanes(hist_r.reshape(1, W))
    cumm_excl = cumm - hist_m.reshape(1, W)
    cumr_incl = cumr

    # gather cum tables at each lane's key (exact dot3: counts > 256
    # are not bf16-exact)
    mb_r = _dot3(cumm_excl, ohr.astype(jnp.bfloat16), 1)   # (1, WIN_R)
    rb_m = _dot3(cumr_incl, ohm.astype(jnp.bfloat16), 1)   # (1, WIN_M)

    dest_r = (grank - rlo) + (mb_r + 0.5).astype(jnp.int32)
    dest_m = (gm - mlo) + (rb_m + 0.5).astype(jnp.int32)

    iota_b = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    ohdr = (jnp.where(own_r, dest_r, neg1)[0][:, None]
            == iota_b[0][None, :]).astype(jnp.bfloat16)    # (WIN_R, B)
    ohdm = (jnp.where(own_m, dest_m, neg1)[0][:, None]
            == iota_b[0][None, :]).astype(jnp.bfloat16)    # (WIN_M, B)

    out = _dot3(res, ohdr, 8) + _dot3(mov, ohdm, 8)
    out_ref[0] = out

    # sanity flags: every owned lane must land exactly once in [0, B)
    fsum = lambda m: jnp.sum(m.astype(jnp.float32))  # noqa: E731
    n_r = fsum(own_r)
    n_m = fsum(own_m)
    bad_dest = (fsum(own_r & ((dest_r < 0) | (dest_r >= B)))
                + fsum(own_m & ((dest_m < 0) | (dest_m >= B))))
    bad_span = (fsum(own_r & ((kr < 0) | (kr >= W)))
                + fsum(own_m & ((km < 0) | (km >= W))))
    flag = (((n_r + n_m) != B).astype(jnp.int32)
            + jnp.int32(2) * (bad_dest > 0).astype(jnp.int32)
            + jnp.int32(4) * (bad_span > 0).astype(jnp.int32))
    # Mosaic wants >=(1,128)-shaped vector stores; broadcast the scalar
    flag_ref[0] = jnp.full((1, LANE), flag, jnp.int32)


def _window_gather(arr_t, starts, win: int):
    """(rows, n) array -> (nb, rows, win) LANE-aligned windows via the
    chunked row-gather trick (push_pallas non-resident table path)."""
    rows, n = arr_t.shape
    k = win // LANE
    Ct = n // LANE
    a = arr_t.reshape(rows, Ct, LANE).transpose(1, 0, 2)    # (Ct, rows, 128)
    cidx = jnp.minimum(starts // LANE, max(Ct - k, 0))
    idx = cidx[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
    w = a[idx]                                    # (nb, k, rows, 128)
    return w.transpose(0, 2, 1, 3).reshape(starts.shape[0], rows, win)


@functools.partial(jax.jit, static_argnames=("nvk", "m_cap", "B", "W",
                                             "win_r", "interpret"))
def merge_sort_packed(pk, np_, key0, ctot, nvk: int, m_cap: int = 131072,
                      B: int = 512, W: int = 512, win_r: int = 1024,
                      interpret: bool = False):
    """Re-sort a packed species block by its key row.

    pk:   (8, n) f32 rows [dx dy dz ux uy uz q vox] (vox in kernel space,
          exact f32 integers < 2^24; dead tail rows zero).
    np_:  live count (scalar int32; lanes >= np_ are dead).
    key0: (n,) int32 sorted key snapshot from the previous sort (dead
          lanes nvk; key0[0] < 0 marks "no snapshot" -> bitonic).
    ctot: (nvk+3,) int32 — cum_tot of the previous sort (= # keys < v for
          the current array's key0), carried so no O(n) histogram runs.

    Returns (pk_sorted, key0_new, ctot_new, anomaly) where anomaly is a
    scalar int32 of in-kernel consistency-flag sums (0 in any valid run;
    nonzero means the output ordering is unreliable — callers surface it
    like dropped movers).
    """
    n = pk.shape[1]
    assert n % B == 0 and win_r % LANE == 0 and m_cap % LANE == 0
    nb = n // B
    BINS = nvk + 1                      # keys 0..nvk-1 + dead bin nvk
    win_m = B + LANE

    in_range = jnp.arange(n, dtype=jnp.int32) < np_
    key = jnp.where(in_range, (pk[7] + 0.5).astype(jnp.int32),
                    jnp.int32(nvk))
    movers = key != key0
    n_m = jnp.sum(movers.astype(jnp.int32))
    # the kernel reads row 7 as the key, so dead lanes (raw row 7 == 0)
    # must carry the dead bin nvk there; the dead tail's row 7 is
    # re-zeroed after assembly (dead ranks sort to the end)
    pk = pk.at[7].set(key.astype(jnp.float32))

    # residual-rank lane table (inclusive count of residual lanes)
    cum_r_lanes = jnp.cumsum((~movers).astype(jnp.int32))
    n_res = cum_r_lanes[-1]

    # ---- mover extraction + small bitonic ----
    # movers spread ~uniformly over lanes (every 128-lane row has some at
    # bench density), so the row-compaction level of compact_indices_hier
    # would overflow its row_cap; the gather/rank-select pass runs on the
    # full (n/128, 128) mask directly — its only scatter is n/128 row
    # marks, everything else is m_cap-sized
    from .push import _compact_rows_gather
    sel, _, valid = _compact_rows_gather(movers.reshape(n // LANE, LANE),
                                         m_cap)
    safe = jnp.where(valid, sel, 0)
    pkm = pk[:, safe]                                  # (8, m_cap)
    key_m = jnp.where(valid, key[safe], jnp.int32(BINS))
    srt = jax.lax.sort((key_m,) + tuple(pkm[r] for r in range(8)),
                       num_keys=1, is_stable=False)
    key_ms = srt[0]
    mov_s = jnp.stack(srt[1:], axis=0)                 # (8, m_cap)
    # row 7 of dead mover slots must stay a harmless key for the kernel
    mov_s = mov_s.at[7].set(jnp.where(key_ms < BINS, mov_s[7], 0.0))

    # ---- per-key cumulative tables (all (BINS+2,) int32) ----
    v = jnp.arange(BINS + 2, dtype=jnp.int32)
    c_old = jnp.minimum(
        jnp.searchsorted(jnp.where(valid, key0[safe], jnp.int32(BINS)),
                         v, side="left").astype(jnp.int32), n_m)
    c_new = jnp.minimum(
        jnp.searchsorted(key_ms, v, side="left").astype(jnp.int32), n_m)
    cum_res = (ctot - c_old).astype(jnp.int32)
    cum_mov = c_new
    cum_tot = (cum_res + cum_mov).astype(jnp.int32)

    # ---- merge-path partition per output block ----
    p = jnp.arange(nb, dtype=jnp.int32) * B
    vj = jnp.searchsorted(cum_tot, p, side="right").astype(jnp.int32) - 1
    vj = jnp.clip(vj, 0, BINS)
    o = p - cum_tot[vj]
    res_in = cum_res[vj + 1] - cum_res[vj]
    rlo = jnp.where(o < res_in, cum_res[vj] + o, cum_res[vj + 1])
    mlo = jnp.where(o < res_in, cum_mov[vj],
                    cum_mov[vj] + (o - res_in))
    rhi = jnp.concatenate([rlo[1:], n_res[None]])
    mhi = jnp.concatenate([mlo[1:], n_m[None]])

    # block key-span check (last key of the block at position p+B-1)
    vj2 = jnp.searchsorted(cum_tot, p + B - 1,
                           side="right").astype(jnp.int32) - 1
    vj2 = jnp.clip(vj2, 0, BINS)
    span_ok = jnp.all(vj2 - vj < W)

    # residual window placement: first lane holding rank rlo, aligned
    lane_lo = jnp.searchsorted(cum_r_lanes, rlo + 1,
                               side="left").astype(jnp.int32)
    lane_lo = jnp.minimum((lane_lo // LANE) * LANE, n - win_r)
    lane_hi = jnp.searchsorted(cum_r_lanes, rhi,
                               side="left").astype(jnp.int32)
    fit_ok = jnp.all(jnp.where(rhi > rlo, lane_hi - lane_lo < win_r,
                               True))
    holes_excl = jnp.arange(n, dtype=jnp.int32) - (cum_r_lanes
                                                   - (~movers))
    rstart = lane_lo - holes_excl[lane_lo]     # = residual ranks < lane_lo

    mlo_al = jnp.minimum((mlo // LANE) * LANE, m_cap - win_m)
    d_m = mlo - mlo_al

    use_fast = ((key0[0] >= 0) & (n_m <= m_cap) & span_ok & fit_ok
                & (cum_tot[BINS + 1] == n))

    def fast(pk):
        meta = jnp.stack([rstart, rlo, rhi, mlo, mhi, d_m, vj],
                         axis=0).astype(jnp.int32)          # (7, nb)
        res_w = _window_gather(pk, lane_lo, win_r)          # (nb,8,win_r)
        msk_w = _window_gather(
            (~movers).astype(jnp.float32)[None, :], lane_lo, win_r)
        mov_w = _window_gather(mov_s, mlo_al, win_m)        # (nb,8,win_m)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                # index-map literals must be np.int32: Python ints trace
                # as i64 under the package-wide x64 config
                pl.BlockSpec((1, 8, win_r),
                             lambda i, m: (i, np.int32(0), np.int32(0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, win_r),
                             lambda i, m: (i, np.int32(0), np.int32(0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, win_m),
                             lambda i, m: (i, np.int32(0), np.int32(0)),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 8, B),
                             lambda i, m: (i, np.int32(0), np.int32(0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, LANE),
                             lambda i, m: (i, np.int32(0), np.int32(0)),
                             memory_space=pltpu.VMEM),
            ],
        )
        out, flags = pl.pallas_call(
            functools.partial(_assemble_kernel, B=B, W=W,
                              WIN_R=win_r, WIN_M=win_m),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((nb, 8, B), jnp.float32),
                jax.ShapeDtypeStruct((nb, 1, LANE), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=14 * 2 ** 20),
            interpret=interpret,
        )(meta, res_w, msk_w, mov_w)
        pk_new = out.transpose(1, 0, 2).reshape(8, n)
        return pk_new, jnp.sum(flags[:, 0, 0]).astype(jnp.int32)

    def slow(pk):
        cols = tuple(pk[r] for r in range(8) if r != 7)
        out = jax.lax.sort((key,) + cols, num_keys=1, is_stable=False)
        key_s = out[0]
        pk_new = jnp.stack(out[1:4] + out[4:7]
                           + (out[7],
                              jnp.where(key_s < nvk, key_s, 0)
                              .astype(jnp.float32)), axis=0)
        return pk_new, jnp.int32(0)

    pk_new, anomaly = jax.lax.cond(use_fast, fast, slow, pk)
    # dead ranks sort to the end; restore their zero row 7 (the packed
    # invariant: dead tail rows are all-zero)
    pk_new = pk_new.at[7].set(jnp.where(in_range, pk_new[7], 0.0))
    key_new = jnp.where(in_range, (pk_new[7] + 0.5).astype(jnp.int32),
                        jnp.int32(nvk))
    # next sort's key0 cumulative: recompute only on the slow path (the
    # fast path's cum_tot is already exact for the merged output)
    ctot_new = jax.lax.cond(
        use_fast, lambda: cum_tot,
        lambda: jnp.searchsorted(key_new, v,
                                 side="left").astype(jnp.int32))
    return pk_new, key_new, ctot_new, anomaly
