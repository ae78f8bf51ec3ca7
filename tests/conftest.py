"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference's hardware-free test target is OpenCL-on-CPU
(test_clenabled.cc --cpu); ours is the JAX CPU backend with
``xla_force_host_platform_device_count=8`` so the sharding layer's
multi-chip paths (ppermute halo exchange, all_to_all X-Engine) execute
for real without TPU hardware.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the real TPU
# tunnel, which would make every jit in the suite pay a 20-40s TPU compile.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The ambient axon site hook re-pins the platform at import time, so the env
# var alone is not enough — force the config after import too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
