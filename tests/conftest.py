"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Per SURVEY.md §7: `--xla_force_host_platform_device_count=8` provides the
distributed test substrate (sharding / psum equivalence) without TPU
hardware. Must run before any `import jax` in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("GEOESTIMATION_TPU_TEST", "1")
