"""Golden sample graphs (FIXTURES.md §A — data as documented, assertions ours)."""

from pyspark_graph_spark import Graph


def sample1(spark, directed=True):
    """6 string vertices a-f; 7 edges; 2 triangles ({a,b,c},{b,d,e})."""
    v = spark.createDataFrame([(c,) for c in "abcdef"], ["id"])
    e = spark.createDataFrame(
        [
            ("a", "b", 9),
            ("a", "c", 9),
            ("b", "d", 9),
            ("b", "c", 9),
            ("b", "e", 9),
            ("e", "d", 9),
            ("b", "a", 9),
        ],
        ["src", "dst", "nine"],
    )
    return Graph(v, e, directed=directed)


def sample2(spark, directed=True):
    """3-cycle a-b-c plus tail c-d-e-f; one component."""
    v = spark.createDataFrame([(c,) for c in "abcdef"], ["id"])
    e = spark.createDataFrame(
        [
            ("a", "b", 9),
            ("b", "c", 9),
            ("c", "a", 9),
            ("c", "d", 9),
            ("d", "e", 9),
            ("e", "f", 9),
        ],
        ["src", "dst", "nine"],
    )
    return Graph(v, e, directed=directed)


def two_components(spark, directed=True):
    """Two 3-vertex components {a,b,c} (a triangle) and {d,e,f}; 1 triangle."""
    v = spark.createDataFrame([(c,) for c in "abcdef"], ["id"])
    e = spark.createDataFrame(
        [
            ("a", "b", 9),
            ("b", "c", 9),
            ("c", "a", 9),
            ("d", "e", 9),
            ("d", "f", 9),
        ],
        ["src", "dst", "nine"],
    )
    return Graph(v, e, directed=directed)


def labelled(spark, directed=True):
    """Long ids 0-5 with a string label column; triangle {0,1,2} + star 3-(4,5)."""
    v = spark.createDataFrame(
        list(zip(range(6), "abcdef")), ["id", "label"]
    )
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 4), (3, 5)], ["src", "dst"]
    )
    return Graph(v, e, directed=directed, indexed=True)
