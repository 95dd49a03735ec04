"""Test configuration: force an 8-device virtual CPU platform BEFORE jax
initializes, so multi-chip sharding tests run without TPU hardware
(the TPU-world answer to testing distributed code without a cluster)."""

import os
import sys

# force CPU: the ambient environment pins JAX_PLATFORMS=axon (the TPU
# tunnel), and tests must run on the 8-device virtual CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compilation cache makes repeated test runs compile-free.
# The directory is keyed by the host CPU's feature fingerprint: XLA:CPU
# stores AOT machine code and jax's cache key ignores host CPU features,
# so after a VM live-migration a fixed path would feed this host code
# compiled for another one (warned as potential SIGILL; observed once as a
# hard futex deadlock in a multi-device step under __graft_entry__).
def _cpu_fingerprint():
    import hashlib

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = line
                    break
    except OSError:
        pass
    return hashlib.sha256(feats.encode()).hexdigest()[:12]


os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", f"/tmp/jax_test_cache_{_cpu_fingerprint()}"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The ambient environment may inject a sitecustomize (PYTHONPATH) that
# registers the axon TPU-tunnel PJRT plugin at interpreter startup and
# pins jax_platforms=axon via jax.config — which runs BEFORE this
# conftest, so the env var above is not enough.  With remote compile
# enabled, every eager op then becomes a network round-trip and the fast
# test lane takes many minutes of pure wall-clock sleep.  Force the
# config back to cpu and drop any already-initialized backends so jax
# re-initializes onto the 8-device virtual CPU platform.
if jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")
    from jax.extend import backend as _jex_backend

    _jex_backend.clear_backends()
assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU platform, got "
    f"{jax.default_backend()}"
)

# XLA:CPU's oneDNN matmuls take reduced-precision (bf16) paths on capable
# hosts; differential tests compare against fp64/fp32 torch+numpy specs, so
# pin full-precision accumulation
jax.config.update("jax_default_matmul_precision", "highest")
