"""Test harness config: run on CPU with 8 virtual devices so multi-chip
sharding paths (halo exchange, psum reductions) are exercised without a pod,
per the reference's gap of having no test suite at all (SURVEY.md section 4).
"""

import os

# force CPU even when the ambient env selects the TPU platform (e.g. axon):
# the suite must run hermetically and exercise the 8-device virtual mesh.
# NOTE: the env var alone is NOT enough here — the ambient TPU plugin wins
# over JAX_PLATFORMS, so we also set jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: the suite re-runs constantly (driver + CI) and
# XLA:CPU compilation of the jitted solves dominates wall time on this host.
# The cache dir is FINGERPRINTED BY HOST CPU FEATURES: this container
# migrates between machines with different CPUs, and XLA:CPU AOT artifacts
# compiled on one machine SIGSEGV when deserialized on another (observed:
# three full-suite segfaults inside compilation_cache.get_executable_and_
# time / backend_compile, preceded by cpu_aot_loader machine-feature
# mismatch warnings).  One cache per CPU flavor keeps warm runs fast and
# kills the cross-host poisoning.
def _cpu_tag() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    return "nocpuinfo"


jax.config.update(
    "jax_compilation_cache_dir", f"/root/.cache/jax_pytest_{_cpu_tag()}"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
