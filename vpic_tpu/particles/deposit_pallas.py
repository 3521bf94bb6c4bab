"""Pallas TPU kernel for charge-conserving current deposition.

The reference avoids deposition races with per-pipeline accumulator replicas
+ a deterministic reduction (advance_p.cxx:62-64, reduce_accumulators.cxx).
The TPU-native equivalent: keep particles sorted by voxel, and turn the
scatter into per-block one-hot matmuls on the MXU:

    for each block of B sorted particles:
        oh   = one_hot(vox - window_start)           # (B, W) on the VPU
        blk  = contrib^T @ oh                        # (12, W) on the MXU
        acc[:, window_start : window_start+W] += blk # dense VMEM add

The accumulator lives in VMEM for the whole kernel in transposed layout
``(12, nv_pad)`` (sublane dim = components, lane dim = voxels) so the
windowed add is a cheap lane-sliced vector op.  Window starts are aligned
to the 128-lane grid.  Particles whose voxel falls outside their block's
window (possible only in pathologically underdense regions) are deposited
by the caller through the XLA scatter fallback.

Determinism: the block order is fixed, each window add is dense — bitwise
reproducible, like the reference's ordered reduction.
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


def _kernel(starts_ref, loc_ref, contrib_ref, acc_ref, *, window):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    start = starts_ref[i]
    rows = loc_ref.shape[0]                            # block // 128
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (window, LANE), 0)
    blk = jnp.zeros((12, window), jnp.float32)
    for r in range(rows):
        loc_row = loc_ref[r, :][None, :]               # (1, 128)
        ohT = (loc_row == iota_w).astype(jnp.float32)  # (W, 128)
        contrib_r = contrib_ref[:, r * LANE:(r + 1) * LANE]  # (12, 128)
        # contract the particle dim: (12,128) x (W,128) -> (12, W)
        blk = blk + jax.lax.dot_general(
            contrib_r, ohT,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            # one-hot weights are exact in any precision, but the contrib
            # operand must not be rounded to bf16 (charge conservation)
            precision=jax.lax.Precision.HIGHEST,
        )
    idx = pl.multiple_of(start, LANE)
    acc_ref[:, pl.ds(idx, window)] += blk


def deposit_sorted(vox, contrib, nv: int, block: int = 1024,
                   window: int = 512):
    """Row-major wrapper: contrib (np, 12)."""
    return deposit_sorted_t(vox, contrib.T, nv, block, window)


@functools.partial(jax.jit, static_argnames=("nv", "block", "window"))
def deposit_sorted_t(vox, contrib_t, nv: int, block: int = 1024,
                     window: int = 512):
    """Deposit ``contrib_t`` (12, np) columns at sorted voxels ``vox``.

    Returns (acc, overflow): ``acc`` is (12, nv_pad) float32 with
    nv_pad = round_up(nv, 128); ``overflow`` is a (np,) bool mask of
    particles NOT deposited (caller must scatter them via the fallback).
    """
    n = vox.shape[0]
    npad = _round_up(max(n, block), block)
    nb = npad // block
    nv_pad = _round_up(nv + 1, LANE)

    vox_p = jnp.concatenate(
        [vox, jnp.full((npad - n,), nv, jnp.int32)]) if npad != n else vox
    contrib_p = jnp.concatenate(
        [contrib_t, jnp.zeros((12, npad - n), contrib_t.dtype)], axis=1) \
        if npad != n else contrib_t

    # per-block MIN, not first-lane: a wrap-crosser outlier as the block
    # representative would overflow the whole block (see the same fix in
    # push_pallas.fused_push_walk); padding voxels are nv (max), so a
    # padded tail block's min stays nv
    starts_raw = jnp.min(vox_p.reshape(nb, block), axis=1)
    starts = jnp.minimum((starts_raw // LANE) * LANE,
                         max(nv_pad - window, 0)).astype(jnp.int32)
    loc = vox_p - jnp.repeat(starts, block)                  # (npad,)
    overflow = (loc >= window) | (loc < 0)
    loc = jnp.where(overflow, 0, loc)
    contrib_k = jnp.where(overflow[None, :], 0.0, contrib_p)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block // LANE, LANE),
                         lambda i, s: (i, np.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, block), lambda i, s: (np.int32(0), i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((12, nv_pad),
                               lambda i, s: (np.int32(0), np.int32(0)),
                               memory_space=pltpu.VMEM),
    )
    acc = pl.pallas_call(
        functools.partial(_kernel, window=window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((12, nv_pad), jnp.float32),
    )(starts, loc.reshape(nb * (block // LANE), LANE), contrib_k)

    return acc, overflow[:n] if npad != n else overflow


def deposit_sorted_into(acc, vox, contrib_cols, valid, nv: int,
                        block: int = 1024, window: int = 512,
                        max_overflow: int = 16384):
    """Add the deposition of 12 per-component contribution arrays (tuple of
    (n,) arrays, kept 1D/column-major to avoid lane padding) at
    (near-)sorted voxels into ``acc`` (nv, 12).  ``valid`` masks live
    particles.  Window-overflow residuals (drifted order / dead-slot
    tails) go through a compacted XLA scatter bounded by
    ``max_overflow``."""
    vox = jnp.where(valid, vox, 0)
    contrib_t = jnp.stack(
        [jnp.where(valid, c, 0.0) for c in contrib_cols], axis=0)  # (12, n)
    acc_t, overflow = deposit_sorted_t(vox, contrib_t, nv, block, window)
    acc = acc + acc_t[:, :nv].T

    overflow = overflow & valid
    n = vox.shape[0]
    k = min(max_overflow, n)
    pos = jnp.cumsum(overflow.astype(jnp.int32)) - 1
    slot = jnp.where(overflow & (pos < k), pos, k)
    sel = jnp.zeros((k,), jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    ok = jnp.arange(k, dtype=jnp.int32) < jnp.sum(overflow)
    res = jnp.where(ok[:, None], contrib_t[:, sel].T, 0.0)
    acc = acc.at[jnp.where(ok, vox[sel], 0)].add(
        res, mode="promise_in_bounds")
    # particles beyond max_overflow are dropped (counted by the caller via
    # the returned count; generous capacity makes this unreachable)
    return acc, jnp.maximum(jnp.sum(overflow) - k, 0)


def deposit_dense_sorted(vox, contrib, nv: int, block: int = 1024,
                         window: int = 512):
    """Full deposition: Pallas main path + XLA scatter for window-overflow
    residuals.  Returns acc in (nv, 12) row layout (transposed back)."""
    acc = jnp.zeros((nv, 12), jnp.float32)
    cols = tuple(contrib[:, k] for k in range(12))
    acc, _ = deposit_sorted_into(
        acc, vox, cols, jnp.ones(vox.shape, bool), nv, block, window,
        max_overflow=vox.shape[0])
    return acc
