"""Utilities: observability (timing, debug logging, profiling) and the
persistent compilation cache."""

from .compile_cache import enable_compilation_cache
from .observability import (
    ProgressMeter,
    Timer,
    debug_print,
    env_flag,
    set_debug,
    stage_timer,
    trace,
)

__all__ = [
    "ProgressMeter",
    "Timer",
    "debug_print",
    "env_flag",
    "enable_compilation_cache",
    "set_debug",
    "stage_timer",
    "trace",
]
