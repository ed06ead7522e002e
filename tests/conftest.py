"""Test harness configuration.

Unit tests must run on real host CPU with a virtual 8-device mesh (the
analogue of the reference's oversubscribed `mpirun -np N` CI runs, SURVEY.md
§4) and float64 enabled (the reference is double everywhere).

The surrounding environment may pin JAX at a tunneled TPU (JAX_PLATFORMS=axon
with a sitecustomize hook that routes *all* XLA compilation through the remote
TPU compiler — multi-minute latency and f64-hostile).  That hook runs at
interpreter startup, before conftest, so the only reliable fix is to re-exec
the interpreter once with a scrubbed environment.
"""

import os
import sys

_AXON_VARS = ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
              "PALLAS_AXON_TPU_GEN", "AXON_LOOPBACK_RELAY",
              "AXON_POOL_SVC_OVERRIDE")

if (os.environ.get("PALLAS_AXON_POOL_IPS")
        and os.environ.get("_PAROPT_TPU_TEST_REEXEC") != "1"):
    env = dict(os.environ)
    env["_PAROPT_TPU_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    for var in _AXON_VARS:
        env.pop(var, None)
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join(pp)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the test suite re-jits the same kernels in
# every pytest process; caching compilations cuts suite wall-clock a lot.
# The directory is keyed by the HOST CPU's feature set: XLA:CPU caches AOT
# machine code, and loading artifacts compiled on a different machine type
# (this environment migrates across VMs between sessions) can SIGILL or
# SIGSEGV mid-suite (observed 2026-08-19: stale +amx artifacts crashed
# test_fused_nk_sharded with exit 139).
def _cpu_fingerprint():
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(
                        " ".join(sorted(line.split()[2:])).encode()
                    ).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return platform.machine()


_cache_dir = os.path.join(os.path.dirname(__file__),
                          ".jax_cache-" + _cpu_fingerprint())
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass


# The suite compiles hundreds of XLA:CPU executables in ONE process; each
# maps its code sections, and the process hits vm.max_map_count (65530
# default) late in a cold-cache run — LLVM then aborts with "Cannot
# allocate memory" at ~5 GB RSS on a 125 GB box (observed 2026-08-19,
# exits 134/139 in test_sharding). Two mitigations: raise the knob when
# permitted, and drop compiled executables between test MODULES (the
# persistent cache makes any reload cheap).
try:
    with open("/proc/sys/vm/max_map_count", "w") as f:
        f.write("1048576")
except OSError:
    pass


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_executables_per_module():
    yield
    jax.clear_caches()
