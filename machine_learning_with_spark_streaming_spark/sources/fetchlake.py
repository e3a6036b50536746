"""Generic remote-fetch-to-lake adapter (VERDICT r10 item 8) — closes
the S9 conceptual gap (reference `packages/mySPClass.py:82-139`: list a
remote store, pull each file, feed the pipeline) with public plumbing
only: a manifest of resource URIs, a custom Python DataSource that
fetches each URI EXECUTOR-side, and a landing step that writes fetched
payloads to the lake and failed fetches to an error side output (K8
parity, `myConversionsClass.py:273-276`) instead of killing the job.

Shape at scale: the manifest (one URI per line; # comments) is the only
driver-side read. Planning emits one ``InputPartition`` per URI, so a
million-file manifest fans out across the cluster and stragglers/
failures are per-partition, not per-job. Payloads land as opaque
``binary`` next to their URI — the multimodal-column contract — and all
downstream analytics run on the LAKE copy, so a flaky remote is paid
exactly once. ``file://``/plain paths serve local stores and tests;
``http(s)://`` uses stdlib urllib — no vendor SDK, no auth protocol
baked in (a real deployment subclasses ``_fetch``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from machine_learning_with_spark_streaming_spark.registry import register
from machine_learning_with_spark_streaming_spark.schemas import load_table

FETCH_SCHEMA = "uri string, payload binary, fetched boolean, err string"


class _FetchPartition(InputPartition):
    def __init__(self, uri: str):
        self.uri = uri


def _read_manifest(path: str) -> list[str]:
    uris: list[str] = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if line and not line.startswith("#"):
                uris.append(line)
    return uris


def _fetch(uri: str) -> bytes:
    if uri.startswith(("http://", "https://", "file://")):
        from urllib.request import urlopen

        with urlopen(uri, timeout=30) as r:  # noqa: S310 — generic adapter
            return r.read()
    with open(uri, "rb") as f:
        return f.read()


class FetchDataSource(DataSource):
    """``spark.read.format("mlwss_fetch")`` — option ``manifest`` names
    a text file of resource URIs; each URI becomes one partition whose
    payload is fetched executor-side. A failed fetch yields a row with
    ``fetched=false`` and the error text — never an exception."""

    @classmethod
    def name(cls) -> str:
        return "mlwss_fetch"

    def reader(self, schema):
        return _FetchReader(self.options)

    def schema(self) -> str:
        return FETCH_SCHEMA


class _FetchReader(DataSourceReader):
    def __init__(self, options):
        self.manifest = options["manifest"]

    def partitions(self):
        return [_FetchPartition(u) for u in _read_manifest(self.manifest)]

    def read(self, partition):
        uri = partition.uri
        try:
            payload = _fetch(uri)
        except Exception as exc:  # noqa: BLE001 — error row IS the contract
            yield (uri, None, False, f"{type(exc).__name__}: {exc}"[:500])
            return
        yield (uri, payload, True, None)


def fetch_manifest_to_lake(
    spark: SparkSession, manifest: str, lake_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Fetch every manifest URI and land the results: payloads to
    ``lake_dir/data`` (parquet, binary column), failures to
    ``lake_dir/errors`` (K8 side output). One fetch pass total — the
    source DataFrame is persisted across the two filtered writes.
    Returns the (data, errors) DataFrames read back from the lake."""
    spark.dataSource.register(FetchDataSource)
    src = (
        spark.read.format("mlwss_fetch").option("manifest", manifest).load()
    ).persist()
    try:
        src.filter(F.col("fetched")).select("uri", "payload").write.mode(
            "overwrite"
        ).parquet(f"{lake_dir}/data")
        src.filter(~F.col("fetched")).select("uri", "err").write.mode(
            "overwrite"
        ).parquet(f"{lake_dir}/errors")
    finally:
        src.unpersist()
    return spark.read.parquet(f"{lake_dir}/data"), spark.read.parquet(
        f"{lake_dir}/errors"
    )


_S9_ORACLE = """
WITH sel AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 2
),
sh AS (
  SELECT 'shard_' || (doc_id % 8) || '.txt' AS resource,
         strlen(string_agg(text, chr(10) ORDER BY doc_id)) AS n_bytes
  FROM sel GROUP BY 1
)
SELECT resource, CAST(n_bytes AS BIGINT) AS n_bytes, TRUE AS fetched FROM sh
UNION ALL
SELECT 'missing_a.txt', CAST(NULL AS BIGINT), FALSE
UNION ALL
SELECT 'missing_b.txt', CAST(NULL AS BIGINT), FALSE
ORDER BY resource
"""


@register("s9_manifest_fetch_lake", oracle=_S9_ORACLE)
def q_manifest_fetch_lake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 re-expressed generically: stage a documents slice as 8 shard
    files, list them in a manifest alongside two dead URIs, fetch-to-
    lake (payloads to parquet, failures to the error side output), and
    report per-resource byte counts from the LAKE copy — byte-exact
    against the oracle's UTF-8 octet lengths, dead URIs surfacing as
    ``fetched=false`` rows instead of a failed job."""
    import shutil
    import tempfile

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 2)
        .select("doc_id", "text")
        .collect()
    )
    shards: dict[int, list[tuple[int, str]]] = {}
    for r in docs:
        shards.setdefault(r["doc_id"] % 8, []).append((r["doc_id"], r["text"]))

    work = tempfile.mkdtemp(prefix="mlwss_s9_")
    store = os.path.join(work, "store")
    os.makedirs(store)
    lines = []
    for i, rows in shards.items():
        path = os.path.join(store, f"shard_{i}.txt")
        with open(path, "wb") as fh:
            fh.write("\n".join(t for _, t in sorted(rows)).encode("utf-8"))
        lines.append(path)
    lines.append(os.path.join(store, "missing_a.txt"))
    lines.append(os.path.join(store, "missing_b.txt"))
    manifest = os.path.join(work, "manifest.txt")
    with open(manifest, "w", encoding="utf-8") as fh:
        fh.write("# staged document shards\n")
        fh.write("\n".join(sorted(lines)) + "\n")

    data, errors = fetch_manifest_to_lake(spark, manifest, os.path.join(work, "lake"))
    base = lambda c: F.element_at(F.split(c, "/"), -1)  # noqa: E731
    out = (
        data.select(
            base(F.col("uri")).alias("resource"),
            F.length("payload").cast("long").alias("n_bytes"),
            F.lit(True).alias("fetched"),
        )
        .unionByName(
            errors.select(
                base(F.col("uri")).alias("resource"),
                F.lit(None).cast("long").alias("n_bytes"),
                F.lit(False).alias("fetched"),
            )
        )
        .orderBy("resource")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(work, ignore_errors=True)
    return out


# --------------------------------------------- publish lake -> store


_SAFE_RESOURCE = r"^[A-Za-z0-9][A-Za-z0-9._-]*$"


def publish_lake_to_store(df: DataFrame, store_dir: str) -> DataFrame:
    """K6's push direction, generically (reference
    `packages/mySPClass.py:189-250` uploads pipeline outputs to the
    remote store): publish a lake relation of ``(resource, payload)``
    rows as files under ``store_dir``, EXECUTOR-side, and return one
    outcome row per resource — ``(resource, n_bytes, md5, published,
    err)`` — so failures are data (K8 parity), never a job kill.

    Contract per row: ``resource`` must match ``[A-Za-z0-9._-]+`` and
    not start with a dot — anything else (separators, traversal, empty)
    is REJECTED before any byte is written; accepted payloads land via
    write-to-temp + ``os.replace`` so a concurrent reader never sees a
    torn file (the WAP swap at file grain). The md5 is computed from
    the bytes actually written, so the outcome manifest doubles as an
    integrity receipt the caller can verify against the source.

    Scale shape: one Arrow ``mapInPandas`` pass over the lake relation
    — per-partition fan-out to the shared store exactly like a blob-
    store uploader; no driver-side loop, no collect."""
    import hashlib

    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("resource", StringType()),
            StructField("n_bytes", LongType()),
            StructField("md5", StringType()),
            StructField("published", BooleanType()),
            StructField("err", StringType()),
        ]
    )

    def publish(batches):
        import os as _os
        import re as _re
        import uuid as _uuid

        import pandas as _pd

        pat = _re.compile(_SAFE_RESOURCE)
        for pdf in batches:
            out = []
            for resource, payload in zip(pdf["resource"], pdf["payload"]):
                if resource is None or not pat.match(str(resource)):
                    out.append((resource, None, None, False, "unsafe resource name"))
                    continue
                try:
                    data = bytes(payload) if payload is not None else b""
                    tmp = _os.path.join(
                        store_dir, f".tmp-{_uuid.uuid4().hex}-{resource}"
                    )
                    with open(tmp, "wb") as fh:
                        fh.write(data)
                    _os.replace(tmp, _os.path.join(store_dir, str(resource)))
                    out.append(
                        (
                            resource,
                            len(data),
                            hashlib.md5(data).hexdigest(),
                            True,
                            None,
                        )
                    )
                except Exception as exc:  # noqa: BLE001 — outcome row contract
                    out.append(
                        (resource, None, None, False, f"{type(exc).__name__}: {exc}"[:500])
                    )
            yield _pd.DataFrame(
                out, columns=["resource", "n_bytes", "md5", "published", "err"]
            )

    return df.select("resource", "payload").mapInPandas(publish, out_schema)


_K6_ORACLE = """
SELECT 'doc_' || doc_id || '.txt' AS resource,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(text) AS md5,
       TRUE AS published
FROM documents WHERE doc_id % 5 = 2
UNION ALL
SELECT '../escape.txt', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), FALSE
ORDER BY resource
"""


@register("k6_publish_store", oracle=_K6_ORACLE)
def q_publish_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 re-expressed generically: publish a documents slice from the
    lake to a store directory executor-side (atomic per-file swap), a
    planted path-traversal resource rejected as an outcome row, and the
    integrity receipt (bytes + md5 of what was WRITTEN) hash-certified
    against the source-of-truth oracle."""
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="mlwss_k6_")
    store = os.path.join(work, "store")
    os.makedirs(store)

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 2)
        .select(
            F.concat(F.lit("doc_"), F.col("doc_id"), F.lit(".txt")).alias("resource"),
            F.encode("text", "UTF-8").alias("payload"),
        )
    )
    bad = spark.createDataFrame(
        [("../escape.txt", bytearray(b"nope"))], "resource string, payload binary"
    )
    outcome = (
        publish_lake_to_store(docs.unionByName(bad), store)
        .select("resource", "n_bytes", "md5", "published")
        .orderBy("resource")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(work, ignore_errors=True)
    return outcome
