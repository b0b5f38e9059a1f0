"""Small shared helpers.

`getenv_flag` reproduces the reference's `helpers.getenv` semantics
(helpers.py:4): numeric strings are int-cast, so ONLINE=0 / PHYSICS=0
disable the feature — `bool(os.environ.get(...))` would treat "0" as on.
"""

from __future__ import annotations

import os


def getenv_flag(name: str, default: bool = False) -> bool:
    v = os.environ.get(name)
    if v is None or v == "":
        return default
    try:
        return bool(int(v))
    except ValueError:
        return True
