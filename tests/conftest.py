"""Force a deterministic 8-device CPU mesh for all tests (SURVEY.md §4:
multi-host behavior is validated on a virtual CPU mesh, not real chips).

The driver environment boots every interpreter with an `axon` TPU backend
already registered via sitecustomize and JAX_PLATFORMS=axon, so the env-var
route is insufficient — override jax.config directly before any backend
initialization."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
