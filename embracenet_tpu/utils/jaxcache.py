"""Machine-scoped persistent XLA compilation cache.

XLA:CPU AOT executables embed the *compiling* machine's CPU feature set
(+amx-*, +prefer-no-scatter, ...) but the persistent-cache key does NOT
include it: an entry written by a host with more ISA extensions is
deserialized here with "Machine type used for XLA:CPU compilation doesn't
match" errors and can SIGILL or wedge the loading process mid-execution
(observed: round-2 driver bench rc=124 — its host's CPU entries poisoned
this VM's ``.jax_cache`` and round-3's bench hung inside the first fit).
TPU executables don't have this problem (same chip via the tunnel), but the
engine deliberately jits its population-init programs on the host CPU, so
every process that enables the cache is exposed.

Scoping the cache directory by (jax version, CPU flags) makes cross-machine
reuse impossible while keeping within-machine reuse across processes/rounds.
"""

from __future__ import annotations

import hashlib
import os


def machine_key() -> str:
    try:
        with open("/proc/cpuinfo") as fh:
            flags = next(line for line in fh if line.startswith("flags"))
    except Exception:
        import platform

        flags = platform.processor() + platform.machine()
    import jax

    return hashlib.md5((jax.__version__ + flags).encode()).hexdigest()[:12]


def enable(root: str, min_compile_secs: float = 5.0) -> str:
    """Point jax's persistent compilation cache at ``root/<machine_key>``."""
    import jax

    path = os.path.join(root, machine_key())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
