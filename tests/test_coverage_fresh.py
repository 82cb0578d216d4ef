"""COVERAGE.md freshness gate (VERDICT r5 item 8, r6 item 2).

The committed COVERAGE.md must equal a regeneration from the live
catalog + the driver artifacts it declares it consumed — so a red
driver row, a new query, or a window rotation is visible in the
artifact of record the day it lands, not whenever someone remembers
to re-run the generator.

Race-proofing (VERDICT r6 item 2): the driver writes
CORRECTNESS_r{N}.json *after* the round's closing commit, so a gate
that globs the disk goes red every round through no fault of the
committed file. Instead COVERAGE.md embeds a manifest comment
(``<!-- artifacts: ... -->``) naming exactly the artifacts it
consumed, and this gate regenerates against that manifest. New
post-commit artifacts don't redden the gate; they're picked up at
the next round-start regeneration (and a second assert here makes
that regeneration mandatory once the artifact is part of the
committed tree history — i.e. always-stale files still fail, only
the post-commit race is excused).
"""

from __future__ import annotations

import glob
import os
import re
import subprocess

from tools.gen_coverage import render

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _manifest(committed: str) -> list[str]:
    m = re.search(r"<!-- artifacts: (.*?) -->", committed)
    assert m, "COVERAGE.md is missing its artifact manifest — run `python -m tools.gen_coverage`"
    return m.group(1).split()


def test_coverage_md_is_fresh():
    with open(os.path.join(ROOT, "COVERAGE.md")) as fh:
        committed = fh.read()
    artifacts = _manifest(committed)
    for name in artifacts:
        assert os.path.exists(os.path.join(ROOT, name)), (
            f"COVERAGE.md manifest references a missing artifact: {name}"
        )
    assert committed == render(ROOT, artifacts), (
        "COVERAGE.md is stale vs the catalog / its declared artifacts — "
        "run `python -m tools.gen_coverage`"
    )


def test_coverage_manifest_not_behind_head():
    """Artifacts already part of the committed tree must be in the
    manifest — excusing only the post-commit driver race, not a
    never-regenerated COVERAGE.md."""
    try:
        tracked = subprocess.run(
            ["git", "ls-tree", "-r", "--name-only", "HEAD"],
            cwd=ROOT,
            capture_output=True,
            text=True,
            timeout=30,
            check=True,
        ).stdout.splitlines()
    except (subprocess.SubprocessError, FileNotFoundError):
        # not a git checkout (e.g. an exported tarball) — disk is the
        # only source of truth; fall back to requiring everything
        tracked = [os.path.basename(p) for p in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))]
    tracked_artifacts = sorted(
        name for name in tracked if re.fullmatch(r"CORRECTNESS_r\d+\.json", os.path.basename(name))
    )
    with open(os.path.join(ROOT, "COVERAGE.md")) as fh:
        manifest = set(_manifest(fh.read()))
    missing = [a for a in tracked_artifacts if os.path.basename(a) not in manifest]
    assert not missing, (
        f"COVERAGE.md manifest is behind HEAD — committed artifacts {missing} "
        "are not reflected; run `python -m tools.gen_coverage`"
    )
