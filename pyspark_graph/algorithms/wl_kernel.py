"""Reference-compatible WLKernel (wl_kernel.py:8-32 parity; hashing is over
sorted neighbor multisets so results are stable on any partition layout)."""

from pyspark_graph_spark.operators.wl_kernel import WLKernel  # noqa: F401
