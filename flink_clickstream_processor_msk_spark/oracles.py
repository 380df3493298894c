"""ANSI-SQL oracles (DuckDB dialect) for the reference-parity queries.

Each SQL string computes, over the driver's parquet views, exactly what the
corresponding DataFrame operator computes — including the engine's chosen
semantics for the reference's quirks (SURVEY.md §2.3):

- sessionization = gap-and-islands (new session when the event-time delta
  is STRICTLY GREATER than the gap — Spark ``session_window`` merges events
  exactly ``gap`` apart, verified in tests/test_sessionize.py; Flink would
  split there, a measure-zero divergence documented in SURVEY.md §2.3);
- checkout latch = running product-event count at the LAST checkout
  (max of the running count over checkout rows — the count is nondecreasing);
- tumbling buckets key on session end − 1 ms (Flink ``maxTimestamp``; equal
  bucketing to Spark's ``window_time`` end − 1 µs for all integer millis);
- percent = floor(buy*100/total) cast to double (Java integer division,
  SURVEY.md §2.3.1).

The ``clickevents`` CTE is the SQL twin of
``sources.clickevents.clickevents_from_events`` (FIXTURES.md §2).
"""

from __future__ import annotations

CLICKEVENTS_CTE = """
clickevents AS (
  SELECT
    epoch_ms(ts)                                   AS eventtimestamp,
    CASE WHEN event_type = 'purchase' THEN 'order_checkout'
         ELSE event_type END                       AS event_type,
    CASE WHEN event_type IN ('view','click') THEN event_type
         ELSE 'N/A' END                            AS product_type,
    user_id                                        AS userid,
    event_id                                       AS globalseq
  FROM events
)
"""


def sessions_cte(gap_ms: int) -> str:
    """Gap-and-islands sessionization + per-session Q1 aggregate."""
    return f"""
flagged AS (
  SELECT *,
    (product_type IS NOT NULL AND product_type NOT IN ('', 'N/A')) AS is_product,
    (event_type = 'order_checkout')                                AS is_checkout,
    CASE WHEN lag(eventtimestamp) OVER w IS NULL
           OR eventtimestamp - lag(eventtimestamp) OVER w > {gap_ms}
         THEN 1 ELSE 0 END                                         AS new_sess
  FROM clickevents
  WINDOW w AS (PARTITION BY userid ORDER BY eventtimestamp, globalseq)
),
numbered AS (
  SELECT *,
    sum(new_sess) OVER (PARTITION BY userid ORDER BY eventtimestamp, globalseq
                        ROWS UNBOUNDED PRECEDING)                  AS sess_id
  FROM flagged
),
running AS (
  SELECT *,
    sum(CASE WHEN is_product THEN 1 ELSE 0 END)
      OVER (PARTITION BY userid, sess_id ORDER BY eventtimestamp, globalseq
            ROWS UNBOUNDED PRECEDING)                              AS run_cnt
  FROM numbered
),
sessions AS (
  SELECT
    userid                                                   AS userId,
    CAST(count(*) FILTER (WHERE is_product) AS INTEGER)      AS eventCount,
    CAST(coalesce(max(run_cnt) FILTER (WHERE is_checkout), 0)
         AS INTEGER)                                          AS orderCheckoutEventCount,
    coalesce(list_sort(list(DISTINCT product_type)
                       FILTER (WHERE is_product)), [])        AS deptList,
    1                                                         AS eventKey,
    min(eventtimestamp)                                       AS windowBeginTime,
    max(eventtimestamp) + {gap_ms}                            AS windowEndTime
  FROM running
  GROUP BY userid, sess_id
)
"""


# Driver-facing deptList is a comma-joined string (the harness canonicalizer
# cannot sort array cells); the sessions CTE keeps the array for Q3's unnest.
# coalesce: DuckDB array_to_string([]) is NULL, Spark array_join([]) is ''.
_DEPTLIST_AS_STRING = (
    "* REPLACE (coalesce(array_to_string(deptList, ','), '') AS deptList)"
)


def q1_user_sessions(gap_ms: int) -> str:
    return f"""
WITH {CLICKEVENTS_CTE.strip()},
{sessions_cte(gap_ms).strip()}
SELECT {_DEPTLIST_AS_STRING} FROM sessions
"""


def q1_buy_sessions(gap_ms: int) -> str:
    return f"""
WITH {CLICKEVENTS_CTE.strip()},
{sessions_cte(gap_ms).strip()}
SELECT {_DEPTLIST_AS_STRING} FROM sessions
WHERE orderCheckoutEventCount != 0
"""


def q2_session_stats(gap_ms: int, window_ms: int) -> str:
    return f"""
WITH {CLICKEVENTS_CTE.strip()},
{sessions_cte(gap_ms).strip()},
bucketed AS (
  SELECT *, ((windowEndTime - 1) // {window_ms}) * {window_ms} AS bucket
  FROM sessions
)
SELECT
  CAST(count(*) AS INTEGER)                 AS userSessionCount,
  CAST(count(*) FILTER (WHERE orderCheckoutEventCount != 0)
       AS INTEGER)                          AS userSessionCountWithOrderCheckout,
  CAST(floor(count(*) FILTER (WHERE orderCheckoutEventCount != 0) * 100
             / count(*)) AS DOUBLE)         AS percentSessionswithBuy,
  bucket                                    AS windowBeginTime,
  bucket + {window_ms}                      AS windowEndTime
FROM bucketed
GROUP BY bucket
"""


def q3_department_counts(gap_ms: int, window_ms: int) -> str:
    return f"""
WITH {CLICKEVENTS_CTE.strip()},
{sessions_cte(gap_ms).strip()},
exploded AS (
  SELECT unnest(deptList) AS departmentName,
         ((windowEndTime - 1) // {window_ms}) * {window_ms} AS bucket
  FROM sessions
)
SELECT
  departmentName,
  CAST(count(*) AS INTEGER) AS departmentCount,
  bucket                    AS windowBeginTime,
  bucket + {window_ms}      AS windowEndTime
FROM exploded
GROUP BY departmentName, bucket
"""
