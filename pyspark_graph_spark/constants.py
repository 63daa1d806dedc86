"""Well-known column names used across the engine.

Mirrors the reference's module constants (reference graph.py:7-17) so users of
the reference can map their mental model 1:1, plus a few of our own for the
Pregel engine and derived views.
"""

ID = "id"
SRC = "src"
DST = "dst"
EDGE_ID = "edge_id"

OLD_ID = "old_id"
OLD_SRC = "old_src"
OLD_DST = "old_dst"

ADJ = "adjacent"
DEGREE = "degree"
IN_DEGREE = "in_degree"
OUT_DEGREE = "out_degree"

# Pregel / iterative state columns
STATE = "state"
OLD_STATE = "old_state"
MSG = "msg"
