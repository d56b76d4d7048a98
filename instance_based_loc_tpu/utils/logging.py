"""Conditional logging + memory stats (reference utils/logging.py:1-25,
with CUDA peak memory replaced by the live TPU/backend memory stats)."""

from __future__ import annotations


def conditional_log(statement, log_enabled: bool) -> None:
    if log_enabled:
        print(statement, flush=True)


def get_mem_stats() -> tuple[float, float]:
    """(host RSS GB, device peak GB). Device stats fall back to 0 when the
    backend doesn't expose memory_stats (e.g. CPU)."""
    rss_gb = 0.0
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    rss_gb = float(line.split()[1]) / 1e6
                    break
    except OSError:
        pass
    device_gb = 0.0
    try:
        import jax
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            device_gb = stats.get("peak_bytes_in_use", 0) / 1e9
    except Exception:
        pass
    return round(rss_gb, 3), round(device_gb, 3)
