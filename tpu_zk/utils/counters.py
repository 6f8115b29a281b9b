"""Field-operation counters.

The reference workspace instruments its tests with the ``field-tracker`` crate
(``sumcheck_protocol/src/basic_sumcheck/protocol.rs:6-7`` wraps ``Fr`` in
``Ft!`` and calls ``print_summary!()``).  This module is the equivalent: the
arith layer reports each vectorized field op together with the number of
elements it touched, so protocol-level op counts can be compared against the
reference's field-tracker numbers.

Counting happens at trace time (shapes are static), so it is free at runtime
and works under jit: a jitted function's ops are counted once per compilation.
Use :func:`reset` / :func:`summary` around an eagerly-executed section for
faithful totals.
"""

from __future__ import annotations

import math
from collections import defaultdict

_counts: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
_enabled = False


def enable(on: bool = True) -> None:
    global _enabled
    _enabled = on


def reset() -> None:
    _counts.clear()


def bump(field_name: str, op: str, *arrays) -> None:
    if not _enabled:
        return
    n = 1
    if arrays:
        shapes = [a.shape[:-1] for a in arrays if hasattr(a, "shape")]
        if shapes:
            n = max((math.prod(s) if s else 1) for s in shapes)
    _counts[field_name][op] += n


def summary() -> dict[str, dict[str, int]]:
    return {k: dict(v) for k, v in _counts.items()}


def print_summary() -> None:
    for fname, ops in summary().items():
        total = sum(ops.values())
        print(f"[{fname}] " + ", ".join(f"{k}: {v}" for k, v in sorted(ops.items())) + f" (total {total})")
