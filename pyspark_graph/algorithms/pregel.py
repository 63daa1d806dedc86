"""Reference-compatible Pregel (pregel.py:11-90 parity).

The reference names its message column "message" via the ``Pregel.MSG``
class attribute (pregel.py:23); code that uses the attribute symbolically
is fully portable. The engine's column is "msg" — the attributes below
resolve to the engine's actual names.
"""

from pyspark_graph_spark import constants as _c
from pyspark_graph_spark.operators.pregel import Pregel as _Pregel


class Pregel(_Pregel):
    STATE = _c.STATE
    OLD_STATE = _c.OLD_STATE
    MSG = _c.MSG

    def __init__(
        self,
        initial_state,
        agg_expr,
        msg_to_src=None,
        msg_to_dst=None,
        update_expr=None,
        comparison=None,
        max_iterations: int = 10,
    ):
        from pyspark_graph_spark.util import ne_null_safe

        if max_iterations <= 0:
            raise ValueError("max_iterations must be greater than 0")
        super().__init__(
            initial_state=initial_state,
            agg_expr=agg_expr,
            msg_to_dst=msg_to_dst,
            msg_to_src=msg_to_src,
            update_expr=update_expr,
            comparison=comparison or ne_null_safe,
            max_iterations=max_iterations,
        )
