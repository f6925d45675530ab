"""Timers and process resource introspection
(ref common/unix_tools.hpp:18-41: Timer, get_curr_RSS, get_peak_RSS).

The reference threads a Timer + RSS report through every CLI phase and logs
per-batch query throughput (ref cli/query.cpp:1385-1394); `trace` is the
stderr-logging equivalent here.
"""

from __future__ import annotations

import os
import sys
import time


class Timer:
    """ref unix_tools.hpp:39-55."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self._t0


def get_curr_rss() -> int:
    """Current resident set size in bytes (ref get_curr_RSS)."""
    try:
        with open("/proc/self/statm") as f:
            return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE")
    except (OSError, ValueError, IndexError):
        return 0


def get_peak_rss() -> int:
    """Peak resident set size in bytes (ref get_peak_RSS)."""
    try:
        import resource
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
    except (ImportError, ValueError):
        return 0


_VERBOSE = [False]


def set_trace(enabled: bool):
    _VERBOSE[0] = enabled


def trace(msg: str):
    """Phase/progress line on stderr (the reference's logger->trace)."""
    if _VERBOSE[0]:
        print(f"[trace] {msg}", file=sys.stderr)


class PhaseTimer:
    """Context manager: logs '<name>: X.XXX sec, RSS cur/peak MB' on exit."""

    def __init__(self, name: str):
        self.name = name
        self.timer = Timer()

    def __enter__(self):
        self.timer.reset()
        return self

    def __exit__(self, *exc):
        trace(f"{self.name}: {self.timer.elapsed():.3f} sec, "
              f"RSS {get_curr_rss() / 1e6:.0f}/{get_peak_rss() / 1e6:.0f} MB")
        return False
