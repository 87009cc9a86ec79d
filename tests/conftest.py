"""Test configuration: run the suite on a virtual 8-device CPU mesh.

This is the standard JAX substitute for multi-chip hardware
(SURVEY.md §4 prescription (e)): sharding/collective code compiles and
executes against 8 fake CPU devices; Pallas kernels run in interpreter
mode on CPU (exercised for real on TPU by bench.py / the driver).
"""

import os

# The session environment pins JAX_PLATFORMS to the TPU tunnel, and the
# tunnel plugin re-registers itself even when the var says "cpu" — so drop
# the var entirely and pin the platform via jax.config after import.
# Set ATX_TEST_TPU=1 to run the suite against the real chip instead.
if not os.environ.get("ATX_TEST_TPU"):
    os.environ.pop("JAX_PLATFORMS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not os.environ.get("ATX_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
