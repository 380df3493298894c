"""Engine operators.

Reference-parity (SURVEY.md §2.1): sessionize (Q1a-d, F1), session_stats
(Q2a-d), departments (Q3a-d).

Beyond-reference (SURVEY.md §7.0 north star): dedup, similarity, text,
multimodal.
"""

from flink_clickstream_processor_msk_spark.operators.sessionize import (
    buy_sessions,
    sessionize,
)
from flink_clickstream_processor_msk_spark.operators.session_stats import (
    session_stats,
)
from flink_clickstream_processor_msk_spark.operators.departments import (
    department_counts,
)

__all__ = ["sessionize", "buy_sessions", "session_stats", "department_counts"]
