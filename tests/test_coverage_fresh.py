"""COVERAGE.md freshness gate (VERDICT r5 item 8).

The committed COVERAGE.md must equal a regeneration from the live
catalog + the committed CORRECTNESS_r*.json driver artifacts — so a
red driver row, a new query, or a window rotation is visible in the
artifact of record the day it lands, not whenever someone remembers
to re-run the generator.
"""

from __future__ import annotations

import os

from tools.gen_coverage import render

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_coverage_md_is_fresh():
    with open(os.path.join(ROOT, "COVERAGE.md")) as fh:
        committed = fh.read()
    assert committed == render(ROOT), (
        "COVERAGE.md is stale — run `python -m tools.gen_coverage`"
    )
