"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip behavior (SPMD sharding, collectives) is validated on the host with
``--xla_force_host_platform_device_count=8`` — the TPU-native replacement for the
fake-backend distributed testing the reference lacks (SURVEY.md §4).

NOTE: this image's sitecustomize pre-imports jax and registers the ``axon`` TPU
tunnel backend before conftest runs, so env vars alone are ignored —
``jax.config.update`` is the only effective switch, and XLA_FLAGS still applies
because the CPU client is created lazily on first use.
"""

import os
import sys

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vilmedic_tpu_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
