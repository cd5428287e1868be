"""Console + memory diagnostics.

Capability parity with the reference's `util.py:27-81` (ANSI `Log` helpers and
`MemoryLog`), re-expressed for a JAX host process: device-memory stats come from
`jax.local_devices()[i].memory_stats()` instead of `torch.cuda.mem_get_info`.
"""

from __future__ import annotations

import datetime
import os
import time


class Log:
    """ANSI-colored log helpers (reference: util.py:27-48)."""

    CRITICAL = "\033[91m\033[1m"
    ERROR = "\033[91m"
    WARNING = "\033[93m"
    INFO = "\033[92m"
    ENDC = "\033[0m"

    @staticmethod
    def critical(msg: str) -> str:
        out = f"{Log.CRITICAL}{msg}{Log.ENDC}"
        print(out)
        return out

    @staticmethod
    def error(msg: str) -> str:
        out = f"{Log.ERROR}{msg}{Log.ENDC}"
        print(out)
        return out

    @staticmethod
    def warning(msg: str) -> str:
        out = f"{Log.WARNING}{msg}{Log.ENDC}"
        print(out)
        return out

    @staticmethod
    def info(msg: str) -> str:
        out = f"{Log.INFO}{msg}{Log.ENDC}"
        print(out)
        return out


class MemoryLog:
    """Appends timestamped host-RAM% and per-device HBM usage lines to a file.

    Reference: util.py:50-81 (psutil RAM% + per-GPU mem%). Here the device side
    reads XLA's per-device memory statistics when the backend exposes them.
    """

    def __init__(self, path: str):
        self.path = path
        self._t0 = time.time()

    def _host_ram_line(self) -> str:
        try:
            import psutil

            return f"RAM: {psutil.virtual_memory().percent}%"
        except Exception:
            return "RAM: n/a"

    def _device_lines(self) -> str:
        try:
            import jax

            parts = []
            for d in jax.local_devices():
                stats = getattr(d, "memory_stats", lambda: None)()
                if stats and "bytes_in_use" in stats and "bytes_limit" in stats:
                    pct = 100.0 * stats["bytes_in_use"] / max(stats["bytes_limit"], 1)
                    parts.append(f"{d}: {pct:.1f}%")
                else:
                    parts.append(f"{d}: n/a")
            return " | ".join(parts)
        except Exception:
            return "devices: n/a"

    def append(self, note: str = "") -> None:
        stamp = datetime.datetime.now().isoformat(timespec="seconds")
        line = f"{stamp} (+{time.time() - self._t0:.1f}s) {self._host_ram_line()} | {self._device_lines()}"
        if note:
            line += f" | {note}"
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as f:
            f.write(line + "\n")
