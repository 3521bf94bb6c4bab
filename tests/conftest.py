import os

# The test suite runs on a virtual 8-device CPU topology (SURVEY.md §4 test
# plan): fast, deterministic, and no dependency on (possibly tunneled) TPU
# hardware.  In the TPU container a sitecustomize eagerly initializes the
# TPU backend at interpreter startup, so setting the env vars here is not
# enough — we also retarget jax and discard the eager backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if jax.default_backend() != "cpu" or len(jax.devices()) < 8:
    jax.config.update("jax_platforms", "cpu")
    try:
        import jax.extend.backend as _jb
        _jb.clear_backends()
    except Exception:
        pass

# Pallas kernels are exercised by their dedicated interpret-mode tests;
# everything else runs the reference-equivalent XLA paths.
os.environ.setdefault("VPIC_TPU_DISABLE_PALLAS", "1")
