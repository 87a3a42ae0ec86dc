"""Host allocator tuning for paravirtualized hosts.

On the target deployment hosts (VM-isolated TPU frontends), first-touch of a
fresh page costs ~0.5-1 ms (demand faulting across the VM boundary), so every
large short-lived allocation — a 32 MiB ``str.encode``, a NumPy temporary, an
XLA compile arena — pays seconds of fault time while warm pages stream at
multiple GB/s. glibc returns large free blocks to the OS by default
(mmap/munmap per allocation), which re-faults the same working set on every
call.

``tune_host_allocator`` raises glibc's mmap and trim thresholds so large
blocks live on the brk heap and are *reused warm* across alloc/free cycles:
measured on the dev rig, a repeated 32 MiB alloc+copy drops from ~4 s to
~3 ms. No-op (safely) on non-glibc platforms.
"""

from __future__ import annotations

import ctypes
import os

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_done = False


def enable_compile_cache() -> None:
    """Point JAX at a persistent compilation cache (XLA compiles for this
    target are served by a remote AOT service and can take minutes; a warm
    cache turns that into ~1 s per kernel). Opt out with FAC_NO_JAX_CACHE=1;
    override the location with FAC_JAX_CACHE."""
    if os.environ.get("FAC_NO_JAX_CACHE"):
        return
    try:
        import jax

        path = os.environ.get("FAC_JAX_CACHE") or os.path.join(
            os.path.expanduser("~"), ".cache", "fuzzy_aho_corasick_tpu", "jax"
        )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def tune_network() -> bool:
    """Disable TCP slow-start-after-idle for host<->device transfers.

    On tunneled device runtimes (the TPU sits behind a TCP proxy), the kernel
    resets the congestion window after ~200 ms of socket idle, so the first
    transfer after any host-side work restarts from slow-start: measured on
    the dev rig, a 64 MiB host->device ship is ~12 ms back-to-back but
    400-1200 ms after an idle gap — a 30-100x end-to-end search slowdown.
    Clearing ``net.ipv4.tcp_slow_start_after_idle`` (per-netns, needs root in
    the namespace) keeps the window open; returns False (harmlessly) when the
    sysctl isn't writable.
    """
    try:
        with open("/proc/sys/net/ipv4/tcp_slow_start_after_idle", "w") as f:
            f.write("0")
        return True
    except OSError:
        return False


def tune_host_allocator() -> bool:
    """Idempotent; returns True if glibc accepted the tuning."""
    global _done
    if _done:
        return True
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok1 = libc.mallopt(ctypes.c_int(_M_MMAP_THRESHOLD), ctypes.c_int(1 << 30))
        ok2 = libc.mallopt(ctypes.c_int(_M_TRIM_THRESHOLD), ctypes.c_int(1 << 30))
        _done = bool(ok1) and bool(ok2)
    except Exception:
        _done = False
    return _done
