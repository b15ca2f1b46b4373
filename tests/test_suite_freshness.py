"""Slow-tier assurance loop (round-2 verdict weak #5 / task 7).

The default tier carries no reference-parity signal — every torch-golden,
transplant, and hardware-gate test is slow-marked. This test makes the gap
visible: it fails loudly when the committed slow-tier stamp is missing or
was recorded against DIFFERENT source than the current tree, so a commit
that breaks golden parity cannot show an all-green default tier.

The stamp (tests/.slow_tier_stamp.json) is written by conftest's
pytest_sessionfinish after a green, unfiltered `pytest tests/ --runslow`
run, and is committed alongside source changes.
"""

import json
import os

import pytest

from conftest import SLOW_STAMP, source_fingerprint


def test_slow_tier_ran_against_current_source(request):
    if request.config.getoption("--runslow"):
        pytest.skip("slow tier is running right now; the stamp is refreshed "
                    "at session end")
    if not os.path.exists(SLOW_STAMP):
        pytest.fail(
            "No slow-tier stamp found. The torch-golden/transplant tier has "
            "never been recorded against this tree — run\n"
            "    python -m pytest tests/ --runslow\n"
            "(green) to create tests/.slow_tier_stamp.json, and commit it.")
    with open(SLOW_STAMP) as f:
        stamp = json.load(f)
    current = source_fingerprint()
    if stamp.get("fingerprint") != current:
        pytest.fail(
            "STALE slow-tier stamp: package source changed since the last "
            f"green `pytest tests/ --runslow` ({stamp.get('time')}). The "
            "default tier carries no reference-parity signal, so this green "
            "run proves nothing about golden parity — re-run\n"
            "    python -m pytest tests/ --runslow\n"
            "and commit the refreshed tests/.slow_tier_stamp.json.")
