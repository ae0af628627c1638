"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip behavior (SPMD sharding, collectives) is validated on the host with
``--xla_force_host_platform_device_count=8`` — the TPU-native replacement for the
fake-backend distributed testing the reference lacks (SURVEY.md §4).
"""

import os

# Hard override: the image profile exports JAX_PLATFORMS=axon (the real TPU
# tunnel); tests must run on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vilmedic_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
