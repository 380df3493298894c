"""Plan-shape pins for the r16 Arrow-kernel optimizer fences.

Catalyst infers a filter from Generate/threshold predicates over a
pandas-UDF column and pushes it below the round-robin exchange, which
DUPLICATES the ArrowEvalPython node — the kernel runs twice over every
row (guide §4.4; plans/r16/{decontaminate,repetition_filter}_before.txt,
fixed in commit 11b3e15). The fix is `asNondeterministic()` applied at
exactly the exploding/filtering call sites — and deliberately NOT on the
MinHash signature path, where a fence breaks ExtractPythonUDFs' chaining
of sig(sh28(text)) into one eval node (a 1→2 node regression measured
when the fence was briefly global).

These tests pin both halves by counting distinct ArrowEvalPython nodes
in the formatted plan, so neither a lost fence nor an over-applied one
can land silently.
"""

import contextlib
import io
import re


def _arrow_eval_nodes(df) -> int:
    """Distinct ArrowEvalPython operators in df's formatted plan."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    ids = set(re.findall(r"ArrowEvalPython \((\d+)\)", plan))
    ids |= set(re.findall(r"\((\d+)\) ArrowEvalPython", plan))
    return len(ids)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine ten"),
            (3, "spam spam spam spam spam spam spam spam spam"),
        ],
        "doc_id bigint, text string",
    )


def test_repetition_filter_kernel_evaluates_once(spark):
    """The threshold predicate must not split the repetition kernel into
    two ArrowEvalPython nodes (the r16 before-plan regression shape)."""
    from flink_clickstream_processor_msk_spark.operators import text

    assert _arrow_eval_nodes(text.repetition_filter(_docs(spark))) == 1


def test_fenced_shingle_explode_evaluates_once(spark):
    """An exploding consumer of the fenced shingle kernel keeps ONE
    ArrowEvalPython — Generate's inferred size()>0 filter must not be
    pushed below the exchange with its own kernel copy."""
    from pyspark.sql import functions as F

    from flink_clickstream_processor_msk_spark.operators import dedup

    exploded = dedup.shingle_hashes(_docs(spark), fenced=True).select(
        "doc_id", F.explode("shingles").alias("gram")
    )
    assert _arrow_eval_nodes(exploded) == 1


def test_minhash_signature_chain_stays_fused(spark):
    """The UN-fenced signature path must keep sig(sh28(text)) chained in
    ONE eval node — fencing it would add a JVM<->Python round trip of
    every shingle array."""
    from flink_clickstream_processor_msk_spark.operators import dedup

    assert _arrow_eval_nodes(dedup.minhash_signatures(_docs(spark))) == 1
