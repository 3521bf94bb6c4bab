"""Sorted one-hot-matmul deposition kernel vs plain scatter-add
(interpret mode on CPU; the real kernel is exercised on TPU by bench)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from vpic_tpu.particles.deposit_pallas import deposit_dense_sorted


@pytest.mark.parametrize("n,nv", [(5000, 2000), (1024, 130 * 130)])
def test_deposit_matches_scatter(n, nv):
    rng = np.random.default_rng(1)
    vox = jnp.asarray(np.sort(rng.integers(1, nv - 5, n)).astype(np.int32))
    c = jnp.asarray(rng.normal(size=(n, 12)).astype(np.float32))
    ref = jnp.zeros((nv, 12), jnp.float32).at[vox].add(c)
    with pltpu.force_tpu_interpret_mode():
        out = deposit_dense_sorted(vox, c, nv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_deposit_unsorted_overflow_fallback():
    # badly unsorted voxels must still give the exact result (fallback path)
    rng = np.random.default_rng(2)
    n, nv = 4096, 3000
    vox = jnp.asarray(rng.integers(1, nv - 5, n).astype(np.int32))
    c = jnp.asarray(rng.normal(size=(n, 12)).astype(np.float32))
    ref = jnp.zeros((nv, 12), jnp.float32).at[vox].add(c)
    with pltpu.force_tpu_interpret_mode():
        out = deposit_dense_sorted(vox, c, nv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
