"""Probe: VPU elementwise throughput vs operand shape inside a Pallas
kernel.  A (1, n) f32 row occupies 1 of 8 sublanes per vreg; if Mosaic
doesn't pack it, a chain of elementwise ops should run ~8x slower than
the same element count shaped (8, n//8).  This decides whether the fused
kernel's walk math (all (1, block) rows today) is worth re-laying out.

Usage: python tools/vpu_layout_probe.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS_IN_KERNEL = 1024   # elementwise chain length per element


def _kernel(x_ref, o_ref, *, rows, n):
    x = x_ref[:rows, :n]
    one = jnp.float32(1.0)
    acc = x
    for _ in range(REPS_IN_KERNEL):
        acc = acc * jnp.float32(1.0000001) + one
        acc = jnp.where(acc > jnp.float32(2.0), acc - one, acc)
    o_ref[:rows, :n] = acc


def run(rows, n, total):
    # same total element count in every config
    assert rows * n == total
    x = jnp.ones((max(rows, 8), n), jnp.float32)
    f = pl.pallas_call(
        functools.partial(_kernel, rows=rows, n=n),
        out_shape=jax.ShapeDtypeStruct((max(rows, 8), n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    f = jax.jit(f)
    y = f(x)
    float(y[0, 0])
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(x)
    float(y[0, 0])
    dt = (time.perf_counter() - t0) / reps
    gops = total * REPS_IN_KERNEL * 3 / dt / 1e9
    print(f"({rows:5d},{n:7d})  {dt*1e3:8.3f} ms   {gops:8.1f} Gop/s")


def main():
    total = 1 << 17
    for rows in (1, 2, 3, 4, 8, 16, 64):
        n = (total // rows + 127) // 128 * 128
        run(rows, n, rows * n)


if __name__ == "__main__":
    main()
