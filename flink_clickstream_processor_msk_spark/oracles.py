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


def asof_attribution() -> str:
    """SQL twin of the as-of attribution query (operators/asof.py): every
    clickevent joined to the user's latest prior-or-same order_checkout.
    DuckDB's native ASOF JOIN (greatest right time ≤ left time, inclusive)
    is exactly the operator's contract; the purchase side is deduped to
    max globalseq per (user, timestamp) so ties are deterministic."""
    return f"""
WITH {CLICKEVENTS_CTE.strip()},
purchases AS (
  SELECT userid, eventtimestamp, max(globalseq) AS purchase_seq
  FROM clickevents WHERE event_type = 'order_checkout'
  GROUP BY userid, eventtimestamp
)
SELECT e.userid, e.globalseq AS event_seq, p.purchase_seq
FROM clickevents e
ASOF JOIN purchases p
  ON e.userid = p.userid AND e.eventtimestamp >= p.eventtimestamp
"""


def range_session_attribution(gap_ms: int) -> str:
    """SQL twin of the range-join attribution query: every clickevent
    matched to its containing session interval (begin ≤ ts < end, per
    user). Every event lands in exactly one session by construction, so
    the output is a 1:1 relabeling of the input — self-validating."""
    return f"""
WITH {CLICKEVENTS_CTE.strip()},
{sessions_cte(gap_ms).strip()}
SELECT e.userid, e.globalseq AS event_seq,
       s.windowBeginTime AS session_begin,
       s.windowEndTime   AS session_end
FROM clickevents e
JOIN sessions s
  ON e.userid = s.userId
 AND e.eventtimestamp >= s.windowBeginTime
 AND e.eventtimestamp <  s.windowEndTime
"""


# --- Kafka record encodings (K1-K3) ----------------------------------------
# DuckDB's to_json(struct_pack(...)) emits byte-identical compact JSON to
# Spark's to_json(struct(...)) — same key order, string escaping, integer
# and double formatting, and list serialization (verified in
# tests/test_oracle_parity.py via the k1/k2/k3 hash rows) — so the sink
# encoding itself is oracle-checkable.


def k1_departments_kafka_records(gap_ms: int, window_ms: int) -> str:
    """SQL twin of kafka_records(department_counts(...), key_cols=
    [departmentName]) — K1, the keyed departments sink (CP:208-227)."""
    return f"""
WITH base AS ({q3_department_counts(gap_ms, window_ms)})
SELECT
  to_json(struct_pack(departmentName := departmentName)) AS key,
  to_json(struct_pack(departmentName := departmentName,
                      departmentCount := departmentCount,
                      windowBeginTime := windowBeginTime,
                      windowEndTime := windowEndTime)) AS value
FROM base
"""


def k2_session_stats_kafka_records(gap_ms: int, window_ms: int) -> str:
    """SQL twin of kafka_records(session_stats(...)) — K2, round-robin
    (CP:231-239)."""
    return f"""
WITH base AS ({q2_session_stats(gap_ms, window_ms)})
SELECT
  to_json(struct_pack(userSessionCount := userSessionCount,
                      userSessionCountWithOrderCheckout := userSessionCountWithOrderCheckout,
                      percentSessionswithBuy := percentSessionswithBuy,
                      windowBeginTime := windowBeginTime,
                      windowEndTime := windowEndTime)) AS value
FROM base
"""


def e1_departments_es_bulk(gap_ms: int, window_ms: int) -> str:
    """SQL twin of es_bulk_records(department_counts(...),
    "departments_count", id_cols=[departmentName, windowBeginTime]) —
    E1's exact /_bulk NDJSON line pair (CP:265;
    AmazonElasticsearchSink.java:38-44), with the deterministic _id the
    idempotent-delivery pairing uses."""
    return f"""
WITH base AS ({q3_department_counts(gap_ms, window_ms)})
SELECT
  to_json(struct_pack(index := struct_pack(
    "_index" := 'departments_count',
    "_type" := 'departments_count',
    "_id" := departmentName || ':' || CAST(windowBeginTime AS VARCHAR)
  ))) AS action,
  to_json(struct_pack(departmentName := departmentName,
                      departmentCount := departmentCount,
                      windowBeginTime := windowBeginTime,
                      windowEndTime := windowEndTime)) AS source
FROM base
"""


def e2_session_stats_es_bulk(gap_ms: int, window_ms: int) -> str:
    """SQL twin of es_bulk_records(session_stats(...),
    "user_session_counts") — E2, reference-default auto ids (no _id in
    the action line, CP:266)."""
    return f"""
WITH base AS ({q2_session_stats(gap_ms, window_ms)})
SELECT
  to_json(struct_pack(index := struct_pack(
    "_index" := 'user_session_counts',
    "_type" := 'user_session_counts'
  ))) AS action,
  to_json(struct_pack(userSessionCount := userSessionCount,
                      userSessionCountWithOrderCheckout := userSessionCountWithOrderCheckout,
                      percentSessionswithBuy := percentSessionswithBuy,
                      windowBeginTime := windowBeginTime,
                      windowEndTime := windowEndTime)) AS source
FROM base
"""


def e3_buy_sessions_es_bulk(gap_ms: int) -> str:
    """SQL twin of es_bulk_records(buy_sessions(...),
    "user_session_details", id_cols=[userId, windowBeginTime]) — E3's
    exact /_bulk NDJSON line pair (CP:267), the third ES index wired in
    job.ES_INDEXES. The source JSON is k3's already-pinned frame
    (UserIdSessionEvent fields, deptList as an array); the action line
    carries the deterministic (userId, windowBeginTime) _id the
    idempotent-delivery pairing prescribes."""
    return f"""
WITH {CLICKEVENTS_CTE.strip()},
{sessions_cte(gap_ms).strip()}
SELECT
  to_json(struct_pack(index := struct_pack(
    "_index" := 'user_session_details',
    "_type" := 'user_session_details',
    "_id" := CAST(userId AS VARCHAR) || ':' || CAST(windowBeginTime AS VARCHAR)
  ))) AS action,
  to_json(struct_pack(
    userId := userId,
    eventCount := eventCount,
    orderCheckoutEventCount := orderCheckoutEventCount,
    deptList := deptList,
    eventKey := eventKey,
    windowBeginTime := windowBeginTime,
    windowEndTime := windowEndTime)) AS source
FROM sessions WHERE orderCheckoutEventCount != 0
"""


def k3_buy_sessions_kafka_records(gap_ms: int) -> str:
    """SQL twin of kafka_records(buy_sessions(...)) — K3, round-robin
    (CP:243-251). deptList stays an ARRAY here: the JSON value embeds it as
    a list, mirroring the reference's Gson-encoded HashSet
    (UserIdSessionEvent.java:5-12) — the output column is a scalar string,
    so the harness canonicalizer is fine."""
    return f"""
WITH {CLICKEVENTS_CTE.strip()},
{sessions_cte(gap_ms).strip()}
SELECT to_json(struct_pack(
  userId := userId,
  eventCount := eventCount,
  orderCheckoutEventCount := orderCheckoutEventCount,
  deptList := deptList,
  eventKey := eventKey,
  windowBeginTime := windowBeginTime,
  windowEndTime := windowEndTime)) AS value
FROM sessions WHERE orderCheckoutEventCount != 0
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


def sliding_department_activity(window_ms: int, slide_ms: int) -> str:
    """SQL twin of departments.sliding_department_activity: each event is
    assigned to ceil(window/slide) candidate epoch-aligned window starts
    ((ts // slide) - j) * slide and kept where ts < start + window —
    exactly Spark's sliding-window membership (slide form of F.window,
    startTime offset 0). Integer millis only; nothing to drift."""
    n = -(-window_ms // slide_ms)  # ceil
    return f"""
WITH {CLICKEVENTS_CTE.strip()},
prod AS (
  SELECT eventtimestamp, product_type
  FROM clickevents
  WHERE product_type IS NOT NULL AND product_type NOT IN ('', 'N/A')
),
wins AS (
  SELECT product_type AS departmentName,
    ((eventtimestamp // {slide_ms}) - j) * {slide_ms} AS windowBeginTime
  FROM prod
  CROSS JOIN (SELECT unnest(range(0, {n})) AS j) js
  WHERE ((eventtimestamp // {slide_ms}) - j) * {slide_ms} + {window_ms}
        > eventtimestamp
)
SELECT
  departmentName,
  CAST(count(*) AS INTEGER) AS eventCount,
  windowBeginTime,
  windowBeginTime + {window_ms} AS windowEndTime
FROM wins
GROUP BY departmentName, windowBeginTime
"""


def think_time_stats() -> str:
    """SQL twin of session_stats.think_time_stats: identical lag()
    partition/order, integer gap sums far inside double-exact range, one
    correctly-rounded sum/count division for the average."""
    return f"""
WITH {CLICKEVENTS_CTE.strip()},
gaps AS (
  SELECT event_type,
    eventtimestamp - lag(eventtimestamp) OVER (
      PARTITION BY userid ORDER BY eventtimestamp, globalseq
    ) AS gap_ms
  FROM clickevents
)
SELECT event_type,
  CAST(count(*) AS BIGINT)   AS n_gaps,
  CAST(min(gap_ms) AS BIGINT) AS min_gap_ms,
  CAST(max(gap_ms) AS BIGINT) AS max_gap_ms,
  SUM(gap_ms) / count(*)      AS avg_gap_ms
FROM gaps
WHERE gap_ms IS NOT NULL
GROUP BY event_type
"""
