"""Test configuration: run everything on a virtual 8-device CPU mesh.

Tests must not depend on TPU availability; multi-chip sharding is validated
on the forced host-platform device mesh. jax.config.update is used (rather
than env vars) because the test harness may import jaxlib before this file.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
