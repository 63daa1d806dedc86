"""Per-application graph-build caches (round 9, queries/_shared.py).

Pins the sharing contract: second call returns the SAME Graph object
(no rebuild), clear_shared_caches drops it, and the customer-supplier
cache keys on orientation so both variants coexist.
"""

from __future__ import annotations

from pyspark_graph_spark.queries import clear_shared_caches
from pyspark_graph_spark.queries._shared import (
    _COOC_CACHE,
    _CSG_CACHE,
    _cust_supp_graph,
    _supplier_cooc_graph,
)

SF = "/root/testdata/sf0.001"


def test_cooc_cache_hits_and_clears(spark):
    clear_shared_caches()
    g1 = _supplier_cooc_graph(spark, SF)
    g2 = _supplier_cooc_graph(spark, SF)
    assert g1 is g2
    assert len(_COOC_CACHE) == 1
    clear_shared_caches()
    assert not _COOC_CACHE
    g3 = _supplier_cooc_graph(spark, SF)
    assert g3 is not g1
    assert g3.edges.count() == g1.edges.count()
    clear_shared_caches()


def test_csg_cache_keys_on_orientation(spark):
    clear_shared_caches()
    gd = _cust_supp_graph(spark, SF, directed=True)
    gu = _cust_supp_graph(spark, SF, directed=False)
    assert gd is not gu and gd.directed and not gu.directed
    assert _cust_supp_graph(spark, SF, directed=True) is gd
    assert _cust_supp_graph(spark, SF, directed=False) is gu
    # both orientations of the SAME run coexist (eviction is per sf_dir)
    assert len(_CSG_CACHE) == 2
    # undirected symmetric view doubles the directed edge list
    assert gu.symmetric_edges.count() == 2 * gd.edges.count()
    clear_shared_caches()
    assert not _CSG_CACHE
