"""Shared CLI flag parsing helpers.

The reference's boolean flags use ``type=bool`` and therefore treat ANY
non-empty string — including "False" — as True (octsam/models/training.py:
42,87; octsam/data/preprocessing.py:12 — a documented bug we do not
replicate). Both CLIs share this ONE strict parser: unknown tokens error
instead of silently enabling a flag ('--shuffle f' must not shuffle).
"""

from __future__ import annotations

import argparse

_TRUE = ("true", "t", "yes", "y", "on", "1")
_FALSE = ("false", "f", "no", "n", "off", "0", "")


def str2bool(v) -> bool:
    s = str(v).strip().lower()
    if s in _TRUE:
        return True
    if s in _FALSE:
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")
