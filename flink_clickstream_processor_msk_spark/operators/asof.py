"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks,
expressed as a composition of built-ins per the engine's design rules.

``asof_join(left, right, keys, time)`` attaches, to every left row, the
right row with the greatest time ≤ the left row's time within the same
key group (DuckDB ``ASOF JOIN`` semantics, inclusive) — the shape a
training-data pipeline needs for "join each event to the latest prior
state snapshot" / attribution problems.

Spark-first implementation (no range join, no per-key collect):

1. tag left rows 1 and right rows 0, union them by a common schema with
   the right row's payload packed into one struct column;
2. one window — ``partitionBy(keys).orderBy(time, tag)`` with
   ``last(payload, ignorenulls=True)`` over unbounded-preceding — carries
   the latest right payload forward (tag orders a right row BEFORE a
   same-timestamp left row, which is what makes the match inclusive);
3. keep tagged-left rows; inner semantics drop the ones with no match.

Scale shape: ONE shuffle (hash partition by keys), then a per-partition
sort — identical cost to the sort-merge join Spark would run anyway, with
no state beyond the running payload struct. Skewed keys are AQE's problem
like any other window. Right rows must be unique per (keys, time) — the
caller dedupes (e.g. max id per timestamp) so results don't depend on
intra-window tie order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    time_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Interval join: left rows matched to right rows whose
    ``[start_col, end_col)`` interval contains ``left[time_col]``, within
    the same key group.

    Spark-first: an equi-join on the keys with the range predicate as a
    join condition — Catalyst runs it as a hash/sort-merge join on the
    keys with the interval filter applied at the join, so there is no
    cross product and one shuffle per side on the keys. A pathological
    key (one user with millions of rows AND intervals) degrades to that
    key's pair count — the same skew hazard as any keyed join, handled by
    AQE skew splitting; time-bucketing the join key (key, epoch_bucket)
    is the documented escalation if intervals are bounded.
    """
    cond = None
    for k in keys:
        c = left[k] == right[k]
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (left[time_col] >= right[start_col])
        & (left[time_col] < right[end_col])
    )
    joined = left.join(right, cond)
    for k in keys:  # keep one copy of each join key (the left one)
        joined = joined.drop(right[k])
    return joined


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    time_col: str,
    how: str = "inner",
) -> DataFrame:
    """Left rows + the columns of the matching (latest ≤ time) right row.

    Right's non-key, non-time columns come back under their own names;
    they must not collide with left's. ``how`` is 'inner' (drop unmatched
    left rows) or 'left' (keep, with nulls).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    payload_cols = [c for c in right.columns if c not in keys and c != time_col]
    if not payload_cols:
        raise ValueError(
            "asof_join: right side has no payload columns beyond the join "
            f"keys {keys!r} and time column {time_col!r} — nothing to attach"
        )
    # null literals built from the StructType objects, not hand-assembled
    # simpleString casts (which choke on exotic field names)
    l_struct = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow")
    ).schema["_lrow"].dataType
    r_struct = right.select(
        F.struct(*[F.col(c) for c in payload_cols]).alias("_rrow")
    ).schema["_rrow"].dataType
    l_tagged = left.select(
        *keys,
        F.col(time_col).alias("_t"),
        F.lit(1).alias("_tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(r_struct).alias("_rrow"),
    )
    r_tagged = right.select(
        *keys,
        F.col(time_col).alias("_t"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(l_struct).alias("_lrow"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_rrow"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_t", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_match", F.last("_rrow", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    if how == "inner":
        matched = matched.filter(F.col("_match").isNotNull())
    return matched.select("_lrow.*", "_match.*")
