"""Utilities: observability (timing, debug logging, profiling)."""

from .observability import (
    ProgressMeter,
    Timer,
    debug_print,
    set_debug,
    stage_timer,
    trace,
)

__all__ = [
    "ProgressMeter",
    "Timer",
    "debug_print",
    "set_debug",
    "stage_timer",
    "trace",
]
