"""Shared LSM lifecycle for written state tables (r15, VERDICT r14 #2).

Both operator families that maintain amortized disk state — the written
ANN indexes (:mod:`operators.similarity`: ivf/ivfpq cells, lsh buckets,
pq codes) and the banded minhash dedup state (:mod:`operators.dedup`) —
follow the SAME lifecycle: a routing-partitioned BASE installed by
staged write + swap, a flat one-file-per-append DELTA, reads that
self-heal an interrupted swap then union the delta and drop tombstoned
ids, and a periodic compaction that folds the delta back. Rounds 13/14
showed the pattern maintained twice breeds duplicated bug crops (each
crash-window ordering had to be found and fixed on each side
separately), so the disk-shape primitives live here ONCE, parameterized
by layout (subdir, partition columns, delta subdir, id column). The two
families keep their own ORCHESTRATION — what a save writes, when
compaction rewrites its source of truth — and delegate every shared
disk decision to these functions.

Measured properties inherited from both parents (full provenance in the
callers' docstrings): dynamic-partition appends pay 3.6-5.7 s/batch of
committer overhead → appends are flat; uncoalesced appends make
deep-delta reads FILE-OPEN-bound (8.7 s at ~5000 files vs noise at 160)
→ one file per append; an unclustered partitionBy write splinters the
base into a file per task per dir (5× probe-read overhead) →
``repartition(part_cols)`` first; a partitionBy write of an EMPTY frame
emits only _SUCCESS, so later loads crash with UNABLE_TO_INFER_SCHEMA →
empty frames are written plain, keeping the schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hadoop_fs(spark, p: str):
    """(FileSystem, Path) for ``p`` under the session's Hadoop conf —
    portable across local FS / HDFS / s3a."""
    sc = spark.sparkContext
    hp = sc._jvm.org.apache.hadoop.fs.Path(p)
    return hp.getFileSystem(sc._jsc.hadoopConfiguration()), hp


def delete_path(spark, p: str) -> None:
    """Recursive delete, no-op when absent."""
    fs, hp = hadoop_fs(spark, p)
    fs.delete(hp, True)


def write_base_staged(
    rows: DataFrame, path: str, sub: str, part_cols: tuple[str, ...]
) -> None:
    """Write a data-table generation to the ``{sub}_new`` staging dir:
    clustered ``repartition(*part_cols)`` before ``partitionBy`` so the
    base stays ~one file per partition dir; an EMPTY partitioned frame
    is written plain instead (schema keeper — see module docstring).
    The caller installs it with :func:`swap_base`."""
    if part_cols and rows.isEmpty():
        writer = rows.coalesce(1).write.mode("overwrite")
    elif part_cols:
        writer = (
            rows.repartition(*[F.col(c) for c in part_cols])
            .write.mode("overwrite")
            .partitionBy(*part_cols)
        )
    else:
        writer = rows.write.mode("overwrite")
    writer.parquet(f"{path}/{sub}_new")


def swap_base(spark, path: str, sub: str) -> None:
    """Install the staged ``{sub}_new`` generation: delete the live dir,
    rename staged over it. The one crash window (staged present, live
    missing) self-heals in :func:`self_heal_swap` at the next read."""
    fs, cur = hadoop_fs(spark, f"{path}/{sub}")
    staged = spark.sparkContext._jvm.org.apache.hadoop.fs.Path(f"{path}/{sub}_new")
    fs.delete(cur, True)
    fs.rename(staged, cur)


def self_heal_swap(spark, path: str, sub: str) -> None:
    """Finish a crash-interrupted :func:`swap_base`: live dir missing but
    the staged dir present → rename it into place. No-op otherwise."""
    fs, cur = hadoop_fs(spark, f"{path}/{sub}")
    if not fs.exists(cur):
        staged = spark.sparkContext._jvm.org.apache.hadoop.fs.Path(
            f"{path}/{sub}_new"
        )
        if fs.exists(staged):
            fs.rename(staged, cur)


def append_delta(
    rows: DataFrame, path: str, delta_sub: str, n_files: int = 1
) -> None:
    """Flat delta append, coalesced to ``n_files`` (default ONE) parquet
    files — the append half of the LSM contract (module docstring)."""
    rows.coalesce(n_files).write.mode("append").parquet(f"{path}/{delta_sub}")


def read_base_with_delta(spark, path: str, sub: str, delta_sub: str) -> DataFrame:
    """The LSM read path: self-heal an interrupted swap, read the base,
    union the flat delta when one exists (delta columns cast to the
    base's types — the base read surfaces routing columns as INFERRED
    partition columns whose physical types can differ). Tombstones are
    the caller's layer (:func:`apply_tombstones`)."""
    self_heal_swap(spark, path, sub)
    base = spark.read.parquet(f"{path}/{sub}")
    fs, dpath = hadoop_fs(spark, f"{path}/{delta_sub}")
    if fs.exists(dpath):
        delta = spark.read.parquet(f"{path}/{delta_sub}")
        base = base.unionByName(
            delta.select(
                *[
                    F.col(f.name).cast(f.dataType).alias(f.name)
                    for f in base.schema.fields
                ]
            )
        )
    return base


def clear_journal(spark, path: str, delta_sub: str) -> None:
    """Drop the append delta AND tombstones when a generation is
    replaced (save re-train / compact fold): a fresh base already covers
    the corpus, so surviving delta rows would duplicate — and a
    surviving ``deleted_ids`` table would SILENTLY suppress freshly
    rebuilt rows at every load until a compact made the loss physical.
    A re-save states "this is the corpus now"; deletes issued against
    the OLD generation do not outlive it — re-issue post-save deletes if
    they still apply."""
    delete_path(spark, f"{path}/{delta_sub}")
    delete_path(spark, f"{path}/deleted_ids")


# --- tombstones (LSM deletes) -------------------------------------------------


def write_tombstones(spark, path: str, ids, id_col: str) -> None:
    """Tombstone ids out of a state: an O(ids) flat append to
    ``deleted_ids``; every read applies them (:func:`apply_tombstones`),
    compaction drops the rows physically and clears them. ``ids``: an
    iterable or a DataFrame with an ``id_col`` column."""
    tomb = (
        ids
        if isinstance(ids, DataFrame)
        else spark.createDataFrame([(int(i),) for i in ids], f"{id_col} long")
    )
    tomb.select(id_col).distinct().write.mode("append").parquet(
        f"{path}/deleted_ids"
    )


def load_tombstones(spark, path: str) -> DataFrame | None:
    """The live tombstone set, or None when no deletes are pending (the
    existence probe is one filesystem stat — reads in the no-delete
    common case pay nothing)."""
    fs, hp = hadoop_fs(spark, f"{path}/deleted_ids")
    if not fs.exists(hp):
        return None
    return spark.read.parquet(f"{path}/deleted_ids")


def apply_tombstones(spark, path: str, df: DataFrame, id_col: str) -> DataFrame:
    """Filter a state read against live tombstones: a LEFT ANTI join on
    ``id_col`` — the deleted set is takedown-sized, so Catalyst
    broadcasts it and the filter costs one map-side hash probe per row;
    no-op (and no plan node at all) when no deletes are pending."""
    deleted = load_tombstones(spark, path)
    if deleted is None:
        return df
    return df.join(F.broadcast(deleted.select(id_col)), id_col, "left_anti")


def refuse_tombstoned(
    rows: DataFrame, path: str, id_col: str, compact_fn: str, noun: str
) -> None:
    """Append-side guard: re-adding a tombstoned id before a compaction
    has run is REFUSED — the live tombstone would silently suppress the
    re-added rows at every read (delete-then-readd requires a compact
    between). Shared by every index append and the dedup-state append."""
    deleted = load_tombstones(rows.sparkSession, path)
    if deleted is None:
        return
    clash = (
        rows.join(F.broadcast(deleted.select(id_col)), id_col, "left_semi")
        .limit(5)
        .collect()
    )
    if clash:
        raise ValueError(
            f"{id_col}s {sorted(r[id_col] for r in clash)} are tombstoned "
            f"at {path}; run {compact_fn} before re-adding deleted {noun}"
        )


def install_base(
    rows: DataFrame,
    path: str,
    sub: str,
    part_cols: tuple[str, ...],
    delta_sub: str,
    write_sidecars=None,
) -> None:
    """Shared generation install for every save: staged base write →
    sidecars → clear delta + tombstones → swap. The ordering is the r14
    crash-window fix (ADVICE r13): the old generation stays fully live —
    base, sidecars, delta, tombstones all consistent — through the
    EXPENSIVE corpus write; every remaining window is a few filesystem
    ops wide. A crash after the sidecar write leaves old base + new
    sidecars (re-run the save; readers during the window may route on
    the new structure — same exposure a concurrent load always had
    during a non-staged overwrite, now milliseconds instead of the
    corpus-write duration). A crash after the journal clear but before
    the swap leaves the old base live with its tombstones gone
    (resurrected deletes until the save is re-run) — previously that
    window spanned the whole base overwrite, now two renames. A crash
    between the live-dir delete and the rename self-heals at the next
    read (:func:`self_heal_swap`)."""
    spark = rows.sparkSession
    write_base_staged(rows, path, sub, part_cols)
    if write_sidecars is not None:
        write_sidecars()
    clear_journal(spark, path, delta_sub)
    swap_base(spark, path, sub)
