"""Shared read-merge-write for benchmark/measurement report JSON files.

Every measurement script (benchmarks/run.py, scripts/carry_ab.py,
scripts/carry_drift.py, scripts/recipe_scale.py, scripts/serving_slo.py)
merges its result into benchmarks/report_v5e1.json so keys written by the
other tools survive a refresh. One implementation owns the corruption
policy: a result produced by an hours-long run must never be lost to a
crash on a corrupt report, and a corrupt report must never be silently
discarded — it is moved aside to `<name>.corrupt` first.
"""

from __future__ import annotations

import json
import os
from typing import Optional


def merge_report(path: str, result: dict, key: Optional[str] = None) -> dict:
    """Merge `result` into the JSON report at `path` and write it back.

    key=None merges at the top level (dict.update); otherwise the result
    is stored under `key`. Returns the merged document. An unreadable or
    corrupt existing report is renamed to `<path>.corrupt` and a fresh
    document is started.
    """
    merged: dict = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                merged = json.load(f)
            if not isinstance(merged, dict):
                raise ValueError(f"report root is {type(merged).__name__}")
        except (json.JSONDecodeError, ValueError, OSError):
            os.replace(path, path + ".corrupt")
            merged = {}
    if key is None:
        merged.update(result)
    else:
        merged[key] = result
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    return merged
