from pyspark_graph_spark.streaming.events import (
    extract_props,
    sessionize,
    session_stats,
    tumbling_window_agg,
)
from pyspark_graph_spark.streaming.structured import (
    read_events_stream,
    streaming_click_purchase_join,
    streaming_session_stats,
    streaming_tumbling_counts,
)

__all__ = [
    "extract_props",
    "read_events_stream",
    "session_stats",
    "sessionize",
    "streaming_click_purchase_join",
    "streaming_session_stats",
    "streaming_tumbling_counts",
    "tumbling_window_agg",
]

from pyspark_graph_spark.streaming.dedup import streaming_exact_dedup  # noqa: E402
from pyspark_graph_spark.streaming.stateful import (  # noqa: E402
    running_ema_batch,
    running_ema_stream,
)
from pyspark_graph_spark.streaming.upsert import (  # noqa: E402
    merge_upsert_batch,
    streaming_upsert,
)

__all__ += [
    "streaming_exact_dedup",
    "running_ema_batch",
    "running_ema_stream",
    "merge_upsert_batch",
    "streaming_upsert",
]
