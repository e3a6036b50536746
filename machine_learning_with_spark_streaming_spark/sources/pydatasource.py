"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API) —
the engine's EXTENSION POINT for feeds Spark has no built-in reader
for. The reference's SharePoint/REST-style fetchers (SURVEY §2 S9,
declared driver-side out of engine scope) would plug in exactly here:
a DataSource subclass whose reader partitions the remote listing and
pulls each partition executor-side.

The registered demonstration is a JSONL-lines source with explicit
partition planning: the input directory's files are listed at PLAN
time (one ``InputPartition`` per file — the split contract a remote
listing would use), each partition parses its file executor-side with
the stdlib ``json`` module, and malformed lines are counted into a
``_corrupt`` flag column instead of killed (the S20 malformed-ingest
contract). The certified query round-trips a deterministic slice of
``orders`` through the custom source and aggregates — proving schema,
partition planning, and per-partition reads all behave.

Scale shape: one partition per file = the natural remote-fetch
parallelism; nothing is driver-side except the listing. Arrow is not
required by the API (rows yield as tuples); for wide feeds a real
deployment yields pyarrow record batches instead — same plumbing.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _JsonlPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonlDataSource(DataSource):
    """``spark.read.format("mlwss_jsonl")`` — schema is caller-supplied
    (``.schema(...)``), option ``path`` points at a directory of
    ``*.jsonl`` files."""

    @classmethod
    def name(cls) -> str:
        return "mlwss_jsonl"

    def reader(self, schema):
        return _JsonlReader(schema, self.options)


class _JsonlReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        self.path = options["path"]

    def partitions(self):
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".jsonl")
        )
        return [_JsonlPartition(p) for p in files]

    def read(self, partition):
        names = [f.name for f in self.schema.fields if f.name != "_corrupt"]
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                    yield tuple(rec.get(n) for n in names) + (False,)
                except (ValueError, TypeError, AttributeError):
                    yield tuple(None for _ in names) + (True,)


_S25_ORACLE = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
       CAST(0 AS BIGINT) AS n_corrupt
FROM orders WHERE o_orderkey % 10 = 3
GROUP BY 1 ORDER BY 1
"""


def _register_s25():
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.registry import register
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    @register("s25_python_datasource", oracle=_S25_ORACLE)
    def q_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
        """S-family beyond-ref: stage a deterministic orders slice as 4
        JSONL files, read it back through the registered CUSTOM Python
        DataSource (one InputPartition per file), and aggregate —
        certifying schema, partition planning, and executor-side reads
        against the parquet-path oracle."""
        import tempfile

        spark.dataSource.register(JsonlDataSource)

        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") % 10 == 3
        )
        rows = orders.select("o_orderkey", "o_orderstatus").collect()
        work = tempfile.mkdtemp(prefix="mlwss_s25_")
        n_files = 4
        handles = [
            open(os.path.join(work, f"{i:02d}.jsonl"), "w", encoding="utf-8")
            for i in range(n_files)
        ]
        try:
            for r in rows:
                handles[r["o_orderkey"] % n_files].write(
                    json.dumps(
                        {
                            "o_orderkey": r["o_orderkey"],
                            "o_orderstatus": r["o_orderstatus"],
                        }
                    )
                    + "\n"
                )
        finally:
            for h in handles:
                h.close()

        back = (
            spark.read.format("mlwss_jsonl")
            .schema(
                "o_orderkey long, o_orderstatus string, _corrupt boolean"
            )
            .option("path", work)
            .load()
        )
        return (
            back.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("o_orderkey").cast("long").alias("key_sum"),
                F.sum(F.col("_corrupt").cast("long"))
                .cast("long")
                .alias("n_corrupt"),
            )
            .orderBy("o_orderstatus")
        )


_register_s25()
