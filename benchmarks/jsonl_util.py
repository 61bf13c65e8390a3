"""Strict-JSON row serialization for benchmark JSONL artifacts.

``json.dumps`` writes Python ``nan``/``inf`` as bare ``NaN``/``Infinity``
tokens, which are NOT valid JSON — ``jq`` and most non-Python parsers
reject the whole line. Non-finite floats carry "not computed" semantics
in these artifacts, so they serialize as ``null``.
"""

import json
import math


def _sanitize(v):
    if isinstance(v, float) and not math.isfinite(v):
        return None
    if isinstance(v, dict):
        return {k: _sanitize(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_sanitize(x) for x in v]
    return v


def dump_row(row: dict) -> str:
    """One strict-JSON line (no trailing newline)."""
    return json.dumps(_sanitize(row), allow_nan=False)
