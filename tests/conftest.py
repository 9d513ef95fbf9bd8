"""Force a deterministic 8-device CPU mesh for all tests (SURVEY.md §4:
multi-host behavior is validated on a virtual CPU mesh, not real chips)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
