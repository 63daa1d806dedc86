"""COVERAGE.md is generated, not hand-maintained (round-7 verdict item 4).

The file drifted twice while hand-accreted (stale oracle description in r6,
stale '188 queries' totals in r7). This pins the committed file to
``tools/gen_coverage.py`` output byte-for-byte — any registry change that
isn't followed by a regeneration fails here, the same way README's test
counts are pinned by test_readme_counts.py.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_coverage_md_matches_generator():
    import gen_coverage

    expected = gen_coverage.generate()
    with open(os.path.join(REPO, "COVERAGE.md")) as fh:
        actual = fh.read()
    assert actual == expected, (
        "COVERAGE.md is stale — regenerate: python tools/gen_coverage.py"
    )


def test_survey_s2_rows_reference_live_queries():
    # generate() asserts this internally; keep an explicit signal too
    import gen_coverage
    from pyspark_graph_spark.queries import ORACLES, QUERIES

    for _, cap, _, qnames, _ in gen_coverage.SURVEY_S2:
        for q in qnames:
            assert q in QUERIES, (cap, q)
            assert q in ORACLES, (cap, q)
