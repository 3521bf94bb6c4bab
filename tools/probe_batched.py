"""Mosaic feasibility probes for the (8,128)-batched push kernel.

Each probe compiles+runs a minimal Pallas kernel exercising one primitive
the batched redesign needs.  Run on the real chip:

    python tools/probe_batched.py [probe ...]

Probes:
  gather3d   dot_general (32,W) x (8,W,128) contract W -> (32,8,128)
  deposit2d  dot_general (12,8,128) x (8,W,128) contract ((1,2),(0,2)) -> (12,W)
  stack8     8 x dot (32,W)x(W,128) + stack axis=1 -> (32,8,128)
  onehot3d   (8,1,128) == broadcasted_iota(dim=1) 3D one-hot build
  io4d       read (7,8,128) from 4D input block, write (16,8,128) out
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 512
R = 8
LANE = 128


def run(name, fn, *args):
    t0 = time.perf_counter()
    try:
        out = fn(*args)
        s = float(jnp.sum(out if isinstance(out, jax.Array) else out[0]))
        print(f"{name:12s} OK   compile+run {time.perf_counter()-t0:6.1f}s "
              f"sum={s:.3f}")
        return out
    except Exception as e:  # noqa: BLE001
        print(f"{name:12s} FAIL {type(e).__name__}: {str(e)[:200]}")
        return None


def probe_gather3d():
    def kernel(win_ref, oh_ref, out_ref):
        win = win_ref[:].astype(jnp.bfloat16)
        oh = oh_ref[:].astype(jnp.bfloat16)
        out_ref[:] = jax.lax.dot_general(
            win, oh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    win = jnp.asarray(np.random.default_rng(0).normal(size=(32, W)),
                      jnp.float32)
    oh = (jnp.arange(W)[None, :, None] ==
          jnp.arange(LANE)[None, None, :] + jnp.arange(R)[:, None, None]
          ).astype(jnp.float32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((32, R, LANE), jnp.float32),
    )
    return jax.jit(f)(win, oh)


def probe_deposit2d():
    def kernel(c_ref, oh_ref, out_ref):
        c = c_ref[:].astype(jnp.bfloat16)
        oh = oh_ref[:].astype(jnp.bfloat16)
        out_ref[:] = jax.lax.dot_general(
            c, oh, dimension_numbers=(((1, 2), (0, 2)), ((), ())),
            preferred_element_type=jnp.float32)

    c = jnp.asarray(np.random.default_rng(1).normal(size=(12, R, LANE)),
                    jnp.float32)
    oh = (jnp.arange(W)[None, :, None] ==
          jnp.arange(LANE)[None, None, :] + jnp.arange(R)[:, None, None]
          ).astype(jnp.float32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((12, W), jnp.float32),
    )
    return jax.jit(f)(c, oh)


def probe_stack8():
    def kernel(win_ref, loc_ref, out_ref):
        win = win_ref[:].astype(jnp.bfloat16)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, LANE), 0)
        cs = []
        for s in range(R):
            loc0 = loc_ref[s, :][None, :]
            ohT = (loc0 == iota_w).astype(jnp.bfloat16)
            cs.append(jax.lax.dot_general(
                win, ohT, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        out_ref[:] = jnp.stack(cs, axis=1)

    win = jnp.asarray(np.random.default_rng(0).normal(size=(32, W)),
                      jnp.float32)
    loc = jnp.tile(jnp.arange(LANE, dtype=jnp.int32)[None, :], (R, 1))
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((32, R, LANE), jnp.float32),
    )
    return jax.jit(f)(win, loc)


def probe_onehot3d():
    def kernel(loc_ref, out_ref):
        loc = loc_ref[:]                                  # (R, LANE)
        iota3 = jax.lax.broadcasted_iota(jnp.int32, (R, W, LANE), 1)
        oh = (loc[:, None, :] == iota3).astype(jnp.float32)
        out_ref[:] = oh

    loc = jnp.tile(jnp.arange(LANE, dtype=jnp.int32)[None, :], (R, 1))
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, W, LANE), jnp.float32),
    )
    return jax.jit(f)(loc)


def probe_io4d():
    def kernel(ps_ref, out_ref):
        ps = ps_ref[0]                                    # (7, R, LANE)
        a = ps[0] * 2.0 + ps[1]                           # (R, LANE) VPU math
        b = jnp.where(a > 0, a, ps[2])
        out = jnp.concatenate(
            [b[None], ps, jnp.zeros((8, R, LANE), jnp.float32)], axis=0)
        out_ref[0] = out

    ps = jnp.asarray(np.random.default_rng(2).normal(size=(4, 7, R, LANE)),
                     jnp.float32)
    f = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[pl.BlockSpec((1, 7, R, LANE), lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 16, R, LANE), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((4, 16, R, LANE), jnp.float32),
    )
    return jax.jit(f)(ps)


PROBES = {
    "gather3d": probe_gather3d,
    "deposit2d": probe_deposit2d,
    "stack8": probe_stack8,
    "onehot3d": probe_onehot3d,
    "io4d": probe_io4d,
}


def main():
    names = sys.argv[1:] or list(PROBES)
    for n in names:
        run(n, PROBES[n])


if __name__ == "__main__":
    main()
