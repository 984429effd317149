"""Host-keyed JAX compilation-cache directory.

The persistent compilation cache stores serialized executables compiled for
the EXACT host CPU (XLA:CPU AOT machine features). Scratch VMs migrate
between machine types; loading an entry compiled on a previous host first
warns ("Machine type used for XLA:CPU compilation doesn't match...") and can
hard-abort the process (observed: `Fatal Python error: Aborted` inside
`compilation_cache.get_executable_and_time` mid-test-suite). Keying the
directory by the host's CPU flags + jaxlib version gives every machine type
its own cache, so a migrated VM recompiles instead of crashing.
"""

from __future__ import annotations

import hashlib
import os


def jax_cache_dir(base: str = "/tmp/moshpp_tpu_jax_cache") -> str:
    """Compilation-cache dir for THIS host (MOSHPP_JAX_CACHE overrides)."""
    env = os.environ.get("MOSHPP_JAX_CACHE")
    if env:
        return env
    try:
        import jaxlib
        ver = getattr(jaxlib, "__version__", "unknown")
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
        key = hashlib.sha1(f"{ver}|{flags}".encode()).hexdigest()[:10]
        return f"{base}_{key}"
    except Exception:
        return base


def setup_jax_cache(base: str = "/tmp/moshpp_tpu_jax_cache") -> str:
    """Point jax's persistent compilation cache at the host-keyed dir."""
    import jax
    d = jax_cache_dir(base)
    jax.config.update("jax_compilation_cache_dir", d)
    return d
