"""Community quality metrics: conductance and attribute assortativity.

Both take a community/attribute assignment ``labels`` as an (id, label)
DataFrame — the output of Louvain / LabelPropagation, or any vertex
attribute — and evaluate it against the graph's edge structure.

- ``conductance(g, labels)``: per community C, φ(C) = cut(C) /
  min(vol(C), vol(V \\ C)); the standard "how leaky is this community"
  score. Lower is better-separated.
- ``attribute_assortativity(g, labels)``: Newman's categorical
  assortativity coefficient r = (Σᵢ eᵢᵢ − Σᵢ aᵢbᵢ) / (1 − Σᵢ aᵢbᵢ) over
  the label-label edge fraction matrix — +1 when edges only connect
  equal labels, 0 at random mixing.

Scale: both are two broadcast-sized joins of the label table onto the
edge list plus hash aggregations keyed on the label — label cardinality
is communities, not vertices, so the final aggregates are tiny. The
label join is vertex-keyed and benefits from the same pre-partitioning
as every other vertex join. No all-pairs terms anywhere.

Reference parity: complements Modularity (reference has none of these);
same call shape as pyspark_graph/louvain-style evaluators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.graph import Graph

LABEL = "label"


def _labelled_sym_edges(g: Graph, labels: DataFrame) -> DataFrame:
    """Symmetric edge list annotated with src/dst labels."""
    lab = labels.select(
        F.col(labels.columns[0]).alias(ID),
        F.col(labels.columns[1]).alias(LABEL),
    )
    sym = g.symmetric_edges.select(SRC, DST)
    return (
        sym.join(
            lab.select(
                F.col(ID).alias(SRC), F.col(LABEL).alias("__lsrc")
            ),
            on=SRC,
        )
        .join(
            lab.select(F.col(ID).alias(DST), F.col(LABEL).alias("__ldst")),
            on=DST,
        )
    )


def conductance(g: Graph, labels: DataFrame) -> DataFrame:
    """(label, volume, cut, conductance) per community.

    volume = Σ deg(v) over members; cut = #edge endpoints leaving the
    community (each undirected cut edge counted once per side here, i.e.
    from the community's own perspective); φ = cut / min(vol, total−vol).
    Communities whose volume is 0 or the full graph get φ = 0.
    """
    e = _labelled_sym_edges(g, labels)
    per = e.groupBy(F.col("__lsrc").alias(LABEL)).agg(
        F.count(F.lit(1)).alias("volume"),
        F.sum(
            F.when(F.col("__lsrc") != F.col("__ldst"), 1).otherwise(0)
        ).alias("cut"),
    )
    total = per.agg(F.sum("volume").alias("__tot"))
    return per.crossJoin(F.broadcast(total)).select(
        LABEL,
        "volume",
        "cut",
        F.when(
            F.least(F.col("volume"), F.col("__tot") - F.col("volume")) > 0,
            F.round(
                F.col("cut")
                / F.least(F.col("volume"), F.col("__tot") - F.col("volume")),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("conductance"),
    )


def attribute_assortativity(g: Graph, labels: DataFrame) -> DataFrame:
    """Single-row (r) Newman categorical assortativity over labels."""
    e = _labelled_sym_edges(g, labels)
    m = e.groupBy("__lsrc", "__ldst").agg(F.count(F.lit(1)).alias("__c"))
    tot = m.agg(F.sum("__c").alias("__t"))
    frac = m.crossJoin(F.broadcast(tot)).select(
        "__lsrc", "__ldst", (F.col("__c") / F.col("__t")).alias("__e")
    )
    diag = frac.filter(F.col("__lsrc") == F.col("__ldst")).agg(
        F.coalesce(F.sum("__e"), F.lit(0.0)).alias("__tr")
    )
    a = frac.groupBy("__lsrc").agg(F.sum("__e").alias("__a"))
    b = frac.groupBy("__ldst").agg(F.sum("__e").alias("__b"))
    ab = (
        a.join(b, on=F.col("__lsrc") == F.col("__ldst"))
        .agg(F.coalesce(F.sum(F.col("__a") * F.col("__b")), F.lit(0.0)).alias("__ab"))
    )
    return (
        diag.crossJoin(F.broadcast(ab))
        .select(
            F.when(
                F.col("__ab") < 1.0,
                F.round(
                    (F.col("__tr") - F.col("__ab")) / (1.0 - F.col("__ab")),
                    6,
                ),
            )
            .otherwise(F.lit(1.0))
            .alias("assortativity")
        )
    )
