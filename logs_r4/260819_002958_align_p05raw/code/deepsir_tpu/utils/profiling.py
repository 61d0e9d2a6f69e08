"""Profiling + numeric-debug helpers.

The reference's tracing story is wall-clock spans and pdb-on-anomaly
(/root/reference/common/timer.py, common/torch_utils.py:142-153,
train.py:378). TPU equivalents:

  * `maybe_trace` — wraps a step range in a jax.profiler trace (view with
    TensorBoard) when enabled via DEEPSIR_PROFILE=<dir> or an explicit dir.
  * `enable_debug_mode` — turns on jax_debug_nans so any NaN produced under
    jit re-runs op-by-op and raises at the producing primitive (the
    anomaly-detection equivalent of the reference's --debug).
"""
from __future__ import annotations

import contextlib
import logging
import os
from typing import Iterator, Optional

import jax

_logger = logging.getLogger("profiling")


def enable_debug_mode() -> None:
    """NaN anomaly detection (reference --debug + TorchDebugger)."""
    jax.config.update("jax_debug_nans", True)
    _logger.info("debug mode: jax_debug_nans enabled")


def profile_dir() -> Optional[str]:
    return os.environ.get("DEEPSIR_PROFILE") or None


@contextlib.contextmanager
def maybe_trace(step: int, start: int = 10, num_steps: int = 3,
                trace_dir: Optional[str] = None) -> Iterator[bool]:
    """Trace steps [start, start+num_steps) when profiling is enabled."""
    trace_dir = trace_dir or profile_dir()
    active = trace_dir is not None and start <= step < start + num_steps
    if active and step == start:
        _logger.info("profiler: tracing %d steps to %s", num_steps, trace_dir)
        jax.profiler.start_trace(trace_dir)
    try:
        yield active
    finally:
        if trace_dir is not None and step == start + num_steps - 1:
            try:
                jax.profiler.stop_trace()
                _logger.info("profiler: trace written to %s", trace_dir)
            except RuntimeError:
                pass
