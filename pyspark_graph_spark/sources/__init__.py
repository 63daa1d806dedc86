from pyspark_graph_spark.sources.tables import (
    TABLE_NAMES,
    customer_supplier_graph,
    load_table,
    load_tables,
    nation_graph,
    supplier_co_occurrence_edges,
    supplier_co_occurrence_graph,
)

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "customer_supplier_graph",
    "nation_graph",
    "supplier_co_occurrence_edges",
    "supplier_co_occurrence_graph",
]
