#!/usr/bin/env python
"""Generate the driver-gate window (GATE_PRIORITY) — policy as code.

The driver's correctness gate verifies the FIRST 50 entries of
``__spark_entry__.queries()`` each round. Since round 6 the standing
rotation policy is: (a) everything NEW or semantically CHANGED this round
first — a query whose plan moved must never ride a stale green — then
(b) the stalest latest-wins driver-green queries, in registration order
within the same staleness round. Rounds 6–7 hand-edited the list to that
policy; this tool derives it mechanically so the policy cannot drift:

- staleness comes from folding the committed ``CORRECTNESS_r*.json``
  artifacts latest-wins (a query's last driver check is the newest round
  whose window contained it);
- the round's new/changed set is declared as data
  (``ROUND_CHANGED`` in ``pyspark_graph_spark/queries/__init__.py``,
  updated each round alongside the code it describes);
- ``tests/test_gate_rotation.py`` pins ``GATE_PRIORITY`` to this tool's
  output, the same way COVERAGE.md is pinned to gen_coverage.py.

Usage:
    python tools/rotate_gate.py          # print the 50-query window
    python tools/rotate_gate.py --diff   # compare against GATE_PRIORITY
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def fold_latest_checked(repo: str = REPO,
                        upto_round: int | None = None) -> dict[str, int]:
    """query -> newest round whose driver window verified it (green or
    not — a red check still counts as 'recently looked at'; the gate has
    zero latest-fail reds, asserted by the test).

    ``upto_round`` bounds the fold to rounds STRICTLY BELOW it (the window
    for round N folds r1..r{N-1}).  The driver drops ``CORRECTNESS_r{N}.json``
    into the repo AFTER the round-N HEAD is committed, so an unbounded glob
    made the committed GATE_PRIORITY pin drift the moment the driver ran —
    the judge-time red of rounds 8 AND 9.  Callers pass
    ``queries.GATE_ROUND`` so the fold is reproducible from the commit
    alone, whatever later artifacts sit in the working tree.
    """
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        if upto_round is not None and rnd >= upto_round:
            continue
        with open(path) as fh:
            for q in json.load(fh):
                latest[q] = max(latest.get(q, 0), rnd)
    return latest


def compute(new_or_changed: list[str], registration_order: list[str],
            latest: dict[str, int]) -> list[str]:
    """The window: new/changed first (declared order), then stalest
    latest-wins greens; never-checked queries not in the declared set
    count as staleness 0 (most stale). Ties break by registration order."""
    front = [q for q in new_or_changed if q in registration_order]
    seen = set(front)
    reg_index = {q: i for i, q in enumerate(registration_order)}
    rest = sorted(
        (q for q in registration_order if q not in seen),
        key=lambda q: (latest.get(q, 0), reg_index[q]),
    )
    return (front + rest)[:WINDOW]


def main() -> int:
    from pyspark_graph_spark.queries import GATE_PRIORITY, GATE_ROUND, ROUND_CHANGED
    from pyspark_graph_spark.queries._order import REGISTRATION_ORDER

    window = compute(ROUND_CHANGED, REGISTRATION_ORDER,
                     fold_latest_checked(upto_round=GATE_ROUND))
    if "--diff" in sys.argv:
        if window == GATE_PRIORITY:
            print("GATE_PRIORITY matches the rotation policy")
            return 0
        print("GATE_PRIORITY drifts from policy; expected:")
        for q in window:
            print(f'    "{q}",')
        return 1
    for q in window:
        print(f'    "{q}",')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
