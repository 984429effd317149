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
        want = ("flags", "model name", "cpu family", "model\t", "model :",
                "stepping")
        lines = []
        with open("/proc/cpuinfo") as f:
            for ln in f:
                if any(ln.startswith(w) for w in want):
                    lines.append(ln.strip())
                if ln.strip() == "":      # first logical cpu only
                    break
        # The XLA:CPU machine-feature check keys off LLVM's CPUID-based
        # microarch detection, which virtualization does NOT mask even when
        # it genericizes the "model name" string ("Intel(R) Xeon(R)
        # Processor @ 2.10GHz" on every scratch VM here). Two hosts with
        # identical flags + generic name but different family/model CPUID
        # leaves get different AOT machine features (+prefer-no-gather on
        # one, not the other — observed round 5) — so the key must include
        # the numeric family/model/stepping lines, not just the name.
        # Virtual-device topology changes the compiled program too — fold
        # the platform selection + XLA flags in as well.
        env = (os.environ.get("JAX_PLATFORMS", "")
               + "|" + os.environ.get("XLA_FLAGS", ""))
        key = hashlib.sha1(
            ("|".join([ver] + sorted(lines) + [env])).encode()
        ).hexdigest()[:10]
        return f"{base}_{key}"
    except Exception:
        return base


def _patch_atomic_cache_writes() -> None:
    """Make jax's file-cache writes atomic (tmp + rename).

    Upstream `LRUCache.put` is a bare `cache_path.write_bytes(val)`: a
    process dying mid-write (segfault, OOM kill, preemption) leaves a
    TRUNCATED entry, and deserializing a truncated executable can segfault
    every later run that reads it — a poisoned cache that looks warm.
    This re-implements only the eviction-disabled fast path (the default:
    `jax_compilation_cache_max_size` unset) with an atomic rename; the
    eviction path falls through to upstream. Best-effort: silently a no-op
    if jax internals move."""
    try:
        from jax._src import lru_cache as _lru

        if getattr(_lru.LRUCache.put, "_moshpp_atomic", False):
            return
        _orig_put = _lru.LRUCache.put

        def _atomic_put(self, key, val):
            if self.eviction_enabled:
                return _orig_put(self, key, val)
            if not key:
                raise ValueError("key cannot be empty")
            path = self.path / f"{key}{_lru._CACHE_SUFFIX}"
            if path.exists():
                return
            tmp = path.with_name(f"{path.name}.tmp{os.getpid()}")
            tmp.write_bytes(val)
            os.replace(tmp, path)

        _atomic_put._moshpp_atomic = True
        _lru.LRUCache.put = _atomic_put
    except Exception:
        pass


def setup_jax_cache(base: str = "/tmp/moshpp_tpu_jax_cache") -> str:
    """Point jax's persistent compilation cache at the host-keyed dir."""
    import jax
    d = jax_cache_dir(base)
    jax.config.update("jax_compilation_cache_dir", d)
    _patch_atomic_cache_writes()
    # sweep tmp files abandoned by a previous crashed writer
    try:
        for fn in os.listdir(d):
            if ".tmp" in fn:
                os.unlink(os.path.join(d, fn))
    except OSError:
        pass
    return d
