"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's CPU-only CI strategy
(``.github/workflows/python-publish.yml:24-33`` runs plain pytest on CPU)
while adding the multi-device dimension the reference lacks (SURVEY §4):
8 virtual JAX CPU devices stand in for a TPU slice.
"""
import os

# force CPU: the sandbox exports JAX_PLATFORMS=axon (tunnelled TPU) which
# must never be used by the test suite (single-tenant, slow remote
# compile).  The axon PJRT plugin registers itself from sitecustomize
# whenever PALLAS_AXON_POOL_IPS is set and overrides JAX_PLATFORMS, so it
# must be cleared BEFORE the interpreter starts for spawned workers; for
# this process we clear it pre-import and force a cpu platform.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the env pin above is NOT enough: the axon sitecustomize's register()
# already ran at interpreter start and set jax_platforms="axon,cpu" via
# jax.config, which overrides the env var -- without this line the whole
# suite silently runs against the tunnelled TPU (slow, and it collides
# with any concurrent bench/train process on the single chip)
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache, keyed per platform (a shared dir mixes
# remote-TPU and host-CPU AOT results -> machine-feature mismatch noise)
_plat = jax.default_backend()
# ... and per machine: XLA:CPU AOT results bake in host CPU features, so
# a cache dir reused across sandbox machines spews feature-mismatch
# reloads that slow the suite 3-4x.
import hashlib  # noqa: E402
import platform  # noqa: E402
_mach = hashlib.md5(
    (platform.processor() + platform.node()).encode()).hexdigest()[:8]
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("RAVE_TPU_CACHE",
                                 f"/root/.jax_cache_{_plat}_{_mach}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
