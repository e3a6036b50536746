"""K5: lake-maintenance helpers — the reference's SQL Server
``DELETE``/``TRUNCATE``/stored-proc upkeep (``pipeline/SqlUpload.py:33-41``,
``pipeline/Staging.py:30-44``) re-expressed for a parquet lake.

Three tiers, cheapest first:

- ``delete_partitions`` — drop whole partition directories. O(partitions
  touched), no data rewrite; this is the 100 TB path and the reason fact
  tables are written ``partitionBy`` the retention/snapshot key
  (``files.write_partitioned``).
- ``delete_where`` — rewrite surviving rows for arbitrary predicates:
  read, anti-filter, write to a staging dir, atomic swap. On a real
  lakehouse this maps to ``DELETE FROM`` on a Delta/Iceberg table
  (copy-on-write under the hood — same cost shape, engine-managed).
- ``truncate`` — drop all data, keep the schema by writing an empty
  frame of the old schema.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import shutil
import uuid

from pyspark.sql import Column, SparkSession

_AT_FDCWD = -100
_RENAME_EXCHANGE = 2


def _renameat2_exchange(a: str, b: str) -> bool:
    """Atomically EXCHANGE two directory entries via Linux renameat2(2).
    Returns False when the syscall is unavailable (non-Linux libc, old
    kernel, or a filesystem that rejects RENAME_EXCHANGE)."""
    try:
        libc = ctypes.CDLL(ctypes.util.find_library("c"), use_errno=True)
        ret = libc.renameat2(
            _AT_FDCWD,
            os.fsencode(a),
            _AT_FDCWD,
            os.fsencode(b),
            _RENAME_EXCHANGE,
        )
    except (OSError, AttributeError):
        return False
    return ret == 0


def _swap_into_place(path: str, staging: str) -> None:
    """Make ``staging`` become the table at ``path``; old data is
    removed.

    Preferred path (Linux): one ``renameat2(RENAME_EXCHANGE)`` syscall
    swaps the two directory entries atomically — a concurrent reader
    resolves ``path`` to either the old table or the new one, never to
    an absent directory.

    Fallback (no renameat2): two renames with a sub-millisecond window
    where ``path`` does not exist. Crash-recovery contract for that
    window: if ``path`` is missing and a ``<path>__old_*`` sibling
    exists, the interrupted swap is recovered by renaming the old
    sibling back to ``path`` (the staging dir, if present, holds the
    already-complete new table and may be re-swapped instead). A
    table-format lakehouse (Delta/Iceberg) replaces all of this with a
    metadata commit."""
    if _renameat2_exchange(staging, path):
        shutil.rmtree(staging)  # now holds the OLD table
        return
    old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)


def delete_partitions(path: str, partition_col: str, values: list) -> int:
    """Remove ``{partition_col}={value}`` directories; returns how many
    existed. Metadata-only — never reads or rewrites rows."""
    removed = 0
    for v in values:
        part_dir = os.path.join(path, f"{partition_col}={v}")
        if os.path.isdir(part_dir):
            shutil.rmtree(part_dir)
            removed += 1
    return removed


def delete_where(spark: SparkSession, path: str, predicate: Column) -> int:
    """Delete rows matching ``predicate`` from the parquet table at
    ``path`` via copy-on-write: survivors are written to a staging dir
    which then atomically replaces the table dir. Returns rows deleted."""
    df = spark.read.parquet(path)
    before = df.count()
    survivors = df.filter(~predicate)
    staging = f"{path.rstrip('/')}__staging_{uuid.uuid4().hex[:8]}"
    survivors.write.mode("overwrite").parquet(staging)
    after = spark.read.parquet(staging).count()
    _swap_into_place(path, staging)
    return before - after


def truncate(spark: SparkSession, path: str) -> None:
    """Remove all rows but keep the table readable with its schema (the
    ``TRUNCATE TABLE`` contract)."""
    schema = spark.read.parquet(path).schema
    empty = spark.createDataFrame([], schema)
    staging = f"{path.rstrip('/')}__staging_{uuid.uuid4().hex[:8]}"
    empty.write.mode("overwrite").parquet(staging)
    _swap_into_place(path, staging)


def compact_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_col: str | None = None,
) -> tuple[int, int]:
    """Compact a small-file-fragmented parquet table: rewrite to
    ``ceil(total_bytes / target_file_bytes)`` files (per partition
    directory when ``partition_col`` is given). Returns
    ``(files_before, files_after)``.

    Streaming sinks and incremental ingests (one file per micro-batch /
    delta upsert) fragment a lake into thousands of KB-scale files; at
    100 TB the scan's task-scheduling and footer-reading overhead then
    dominates. Periodic compaction to ~128 MB files restores scan
    efficiency. On Delta/Iceberg this is ``OPTIMIZE``; here it is the
    same copy-on-write rewrite + swap used by ``delete_where``.

    Like ``delete_where``/``truncate``, the staged rewrite becomes
    visible via ``_swap_into_place`` — atomic on Linux
    (renameat2 RENAME_EXCHANGE), two-rename fallback elsewhere with the
    crash-recovery contract documented on the helper.
    """

    def _n_parquet_files(p: str) -> int:
        return sum(
            1
            for root, _dirs, files in os.walk(p)
            for f in files
            if f.endswith(".parquet")
        )

    def _bytes(p: str) -> int:
        return sum(
            os.path.getsize(os.path.join(root, f))
            for root, _dirs, files in os.walk(p)
            for f in files
            if f.endswith(".parquet")
        )

    before = _n_parquet_files(path)
    total = _bytes(path)
    n_out = max(1, -(-total // target_file_bytes))  # ceil div
    df = spark.read.parquet(path)
    staging = f"{path.rstrip('/')}__staging_{uuid.uuid4().hex[:8]}"
    if partition_col:
        from pyspark.sql import functions as F

        # repartition(n, partition_col) alone hashes each partition
        # value into ONE task -> one (possibly huge) file per directory.
        # Spread each directory over ~ceil(n_out / n_dirs) tasks with a
        # deterministic row-hash sub-split so big partitions still honor
        # target_file_bytes.
        n_dirs = df.select(partition_col).distinct().count() or 1
        per_dir = max(1, -(-int(n_out) // n_dirs))
        split = F.pmod(F.xxhash64(*df.columns), F.lit(per_dir))
        writer = (
            df.repartition(int(n_out), F.col(partition_col), split)
            .write.mode("overwrite")
            .partitionBy(partition_col)
        )
    else:
        writer = df.repartition(int(n_out)).write.mode("overwrite")
    writer.parquet(staging)
    _swap_into_place(path, staging)
    return before, _n_parquet_files(path)


def write_with_manifest(df, path: str, key_col: str) -> None:
    """K9: data + integrity manifest in one job. Writes ``df`` as
    parquet and, next to it, a ``_manifest`` parquet holding the row
    count and an order-independent content checksum (sum of a 60-bit
    md5 of the key column — associative, so partition/batch order can
    never change it). A downstream consumer (or a later re-write)
    validates the table by recomputing the same two numbers; any lost,
    duplicated, or corrupted row moves the checksum. This is the
    engine-side analog of Delta/Iceberg snapshot manifests, sized to
    one row — at 100 TB the manifest job is the same single aggregate
    the write already shuffles for."""
    from pyspark.sql import functions as F

    df.write.mode("overwrite").parquet(path)
    spark = df.sparkSession
    back = spark.read.parquet(path)
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10)
    manifest = back.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(h.cast("decimal(38,0)")).cast("decimal(38,0)")
        .cast("string")
        .alias("key_checksum"),
    )
    manifest.write.mode("overwrite").parquet(f"{path}_manifest")


def validate_manifest(spark: SparkSession, path: str, key_col: str):
    """Recompute the manifest pair from the data and return
    ``(n_rows, key_checksum, manifest_rows, manifest_checksum, ok)``."""
    from pyspark.sql import functions as F

    back = spark.read.parquet(path)
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10)
    got = back.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(h.cast("decimal(38,0)")).cast("decimal(38,0)").cast("string").alias("c"),
    ).first()
    want = spark.read.parquet(f"{path}_manifest").first()
    return got["n"], got["c"], want["n_rows"], want["key_checksum"], (
        got["n"] == want["n_rows"] and got["c"] == want["key_checksum"]
    )
