"""README test-count claims are enforced, not hand-maintained.

The count drifted stale two rounds running (r5: "570+"/"655" vs 669 actual;
r6 verdict item 7 asked for one source of truth). This meta-test collects
the live suite in a subprocess and fails if either README claim disagrees,
so adding tests without touching README is caught at CI time. Adding this
file's own tests changes the count too — update README in the same commit.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _collected_count() -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
        env={**os.environ, "PYTEST_DISABLE_PLUGIN_AUTOLOAD": ""},
    ).stdout
    m = re.search(r"(\d+) tests collected", out)
    assert m, f"could not parse collection output tail: {out[-500:]}"
    return int(m.group(1))


def test_readme_counts_match_collection():
    readme = open(os.path.join(REPO, "README.md")).read()
    claims = [
        int(m) for m in re.findall(r"(\d+) pytest tests", readme)
    ] + [int(m) for m in re.findall(r"\*\*(\d+) tests\*\*", readme)]
    assert len(claims) == 2, f"expected 2 README count claims, got {claims}"
    actual = _collected_count()
    assert all(c == actual for c in claims), (
        f"README claims {claims} but the suite collects {actual} tests — "
        "update README.md:46 and README.md's feature list in this commit"
    )
