"""Timing utilities: execution-time decorator + human-unit formatter.

Reference: Utils/decorator.py:13-26 (timeit logging decorator) and
Utils/seconds_to_biggest_unit.py:10-47 (greedy sec→min→hour→day promotion,
optionally rescaling an accompanying array in place).  Driver-side helpers —
no Spark surface.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Any, Callable

logger = logging.getLogger("contentwise-impressions-spark")

_CONVERSION = [("sec", 60), ("min", 60), ("hour", 24), ("day", 365)]


def seconds_to_biggest_unit(
    time_in_seconds: float, data_array: Any = None
) -> tuple:
    """Promote a duration to the largest unit where the value stays ≥ 1.

    Mirrors the reference behavior exactly: each promotion divides by the
    CURRENT unit's factor (60, 60, 24), stopping when the next division
    would drop below 1.0; `data_array` (numpy) is rescaled in place
    alongside and returned as a third element when given.
    """
    value, unit = time_in_seconds, "sec"
    unit_index = 0
    while unit_index < len(_CONVERSION) - 1:
        next_value = value / _CONVERSION[unit_index][1]
        if next_value < 1.0:
            break
        value = next_value
        if data_array is not None:
            data_array /= _CONVERSION[unit_index][1]
        unit_index += 1
        unit = _CONVERSION[unit_index][0]
    if data_array is not None:
        return value, unit, data_array
    return value, unit


def timeit(method: Callable) -> Callable:
    """Log a method's wall-clock execution time (decorator.py:13-26)."""

    @functools.wraps(method)
    def timed(*args, **kwargs):
        t0 = time.time()
        result = method(*args, **kwargs)
        value, unit = seconds_to_biggest_unit(time.time() - t0)
        logger.info("%s|Execution time: %.2f %s", method.__name__, value, unit)
        return result

    return timed
