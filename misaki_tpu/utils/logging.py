"""Logging / timing / progress — the reference's aux subsystem equivalents
(include/misaki/core/logger.h, utils.h Timer/ProgressBar), on Python logging.
"""

import logging
import sys
import time

_logger = None


def get_logger():
    global _logger
    if _logger is None:
        _logger = logging.getLogger("misaki_tpu")
        if not _logger.handlers:
            h = logging.StreamHandler(sys.stderr)
            h.setFormatter(
                logging.Formatter(
                    "%(asctime)s %(levelname)s [%(name)s] %(message)s",
                    datefmt="%Y-%m-%d %H:%M:%S",
                )
            )
            _logger.addHandler(h)
            _logger.setLevel(logging.INFO)
    return _logger


class Timer:
    """Wall-clock timer (utils.h:42-63)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.perf_counter()

    def value(self):
        return time.perf_counter() - self.t0

    def __str__(self):
        return time_string(self.value())


def time_string(seconds):
    """Humanized duration (utils.cpp time_string)."""
    if seconds < 1:
        return f"{seconds * 1e3:.1f}ms"
    if seconds < 60:
        return f"{seconds:.2f}s"
    if seconds < 3600:
        return f"{seconds / 60:.2f}m"
    return f"{seconds / 3600:.2f}h"


class ProgressBar:
    """Console progress bar (utils.h:10-40)."""

    def __init__(self, total, width=70, stream=sys.stderr):
        self.total = max(total, 1)
        self.width = width
        self.count = 0
        self.stream = stream
        self.timer = Timer()

    def update(self, n=1):
        self.count += n
        frac = min(self.count / self.total, 1.0)
        filled = int(frac * self.width)
        bar = "=" * max(filled - 1, 0) + (">" if filled else "")
        self.stream.write(
            f"\r[{bar:<{self.width}}] {frac * 100:5.1f}%  ({time_string(self.timer.value())})"
        )
        self.stream.flush()

    def done(self):
        self.update(self.total - self.count)
        self.stream.write("\n")
