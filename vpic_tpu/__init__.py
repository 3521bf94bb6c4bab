"""vpic_tpu — a TPU-native (JAX/XLA/Pallas) relativistic electromagnetic
particle-in-cell framework with the capabilities of VPIC 3.1.2.1
(pdlfs/old-vpic).

This is a from-scratch TPU-first re-design, not a port: the compute path is
jitted JAX + Pallas kernels over SoA pytrees, domain decomposition is a
`jax.sharding.Mesh` + `shard_map` with ICI collectives, and the deck DSL is a
Python configuration API with the same vocabulary as the reference's
compile-time decks (reference: /root/reference/src/vpic/vpic.hxx:126-555).

Physics per step (reference: src/vpic/advance.cxx:13-244):
  clear accumulators -> sort -> collisions -> advance_p (Boris push +
  charge-conserving current deposition) -> boundary/migration rounds ->
  unload currents -> advance_b(1/2) -> advance_e -> advance_b(1/2) ->
  periodic Marder divergence cleaning + shared-face sync -> load
  interpolator -> diagnostics.
"""

import os as _os

import jax as _jax

# fp64 is required for the reference's double-precision reductions
# (src/species_advance/standard/energy_p.cxx:113-116) and init-time
# coordinate math (src/vpic/misc.cxx:47-75).  All bulk state remains fp32;
# every array constructor in this package passes an explicit dtype.
_jax.config.update("jax_enable_x64", True)

# The advance graph is large (minutes of XLA compile); cache compiled
# executables across processes.  Users override via JAX_COMPILATION_CACHE_DIR
# or VPIC_TPU_NO_COMPILE_CACHE.
if (not _os.environ.get("VPIC_TPU_NO_COMPILE_CACHE")
        and not _os.environ.get("JAX_COMPILATION_CACHE_DIR")):
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.expanduser("~/.cache/vpic_tpu/jax"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

__version__ = "0.1.0"

from .core.types import (  # noqa: E402
    Grid,
    FieldState,
    SpeciesState,
    MaterialTable,
    SimState,
)
from .deck.api import Simulation  # noqa: E402

__all__ = [
    "Grid",
    "FieldState",
    "SpeciesState",
    "MaterialTable",
    "SimState",
    "Simulation",
]
