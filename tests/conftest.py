"""Test configuration: force an 8-device virtual CPU mesh.

The environment's axon sitecustomize registers a tunneled TPU backend
and overrides JAX_PLATFORMS for every interpreter, so env vars alone
don't stick — use jax.config.update before any backend initialisation.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
