"""Debug / profile diagnostics mirroring the reference's stderr reporting.

Semantics follow genson-core/src/schema/core.rs:70-130 (``debug``/``profile``
config gates, normal-verbosity truncation of long debug messages to the
first 10 + last 5 lines) and schema.rs:330-365 (phase timings + RSS
self-reporting under ``--profile``). Free-form diagnostic text — not an
output-parity surface (the reference prints to stderr via anstream; no CLI
snapshot captures it).
"""

from __future__ import annotations

import sys


def rss_bytes() -> int | None:
    """Resident set size from /proc/self/status (the reference reads the
    same counter via its get_rss_bytes)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        return None
    return None


def format_bytes(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if abs(n) < 1024:
            return f"{n:.1f} {unit}" if unit != "B" else f"{n} B"
        n /= 1024
    return f"{n:.1f} TiB"


def _truncate(message: str, verbosity: str) -> str:
    lines = message.splitlines()
    if len(lines) > 20 and verbosity != "verbose":
        head = "\n".join(lines[:10])
        tail = "\n".join(lines[-5:])
        return f"{head}\n... ({len(lines) - 15} lines truncated) ...\n{tail}"
    return message


def debug(config, message: str) -> None:
    if getattr(config, "debug", False):
        print(_truncate(message, getattr(config, "verbosity", "normal")),
              file=sys.stderr)


def profile(config, message: str) -> None:
    if getattr(config, "profile", False):
        print(message, file=sys.stderr)


def profile_rss(config, label: str) -> None:
    if getattr(config, "profile", False):
        rss = rss_bytes()
        if rss is not None:
            print(f"📊 RSS {label}: {format_bytes(rss)}", file=sys.stderr)
