import os

# Prefer a virtual 8-device CPU topology (SURVEY.md §4 test plan).  In the
# TPU container a sitecustomize eagerly initializes the TPU backend before
# conftest runs; tests that need multiple devices re-exec themselves in a
# scrubbed subprocess (see tests/multi_device/).  Outside that container
# these defaults give 8 CPU devices directly.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Keep the test suite on the reference-equivalent XLA paths even when the
# ambient interpreter is pinned to a TPU (the Pallas kernels have their own
# dedicated parity tests; everything else should run fast + deterministic).
os.environ.setdefault("VPIC_TPU_DISABLE_PALLAS", "1")
