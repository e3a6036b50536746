import os

import pytest
from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.operators.validation import SchemaConformanceError
from machine_learning_with_spark_streaming_spark.sources.files import (
    find_latest_by_pattern,
    read_auto,
    read_csv,
    write_csv,
)
from machine_learning_with_spark_streaming_spark.sources.jdbc import upsert_delta_rows


@pytest.fixture()
def csv_dir(tmp_path):
    d = tmp_path / "feeds"
    d.mkdir()
    (d / "20240101_feed.csv").write_text("material,value\nA,1\nB,2\n")
    (d / "20240301_feed.csv").write_text("material,value\nC,3\n")
    (d / "junk_feed.csv").write_text("material,value\nD,4\n")
    return d


def test_read_csv_multi_file_union_with_lineage(spark, csv_dir):
    df = read_csv(spark, f"{csv_dir}/*_feed.csv", with_filename=True)
    assert df.count() == 4
    assert "file_name" in df.columns


def test_read_csv_conformance_gate(spark, csv_dir):
    with pytest.raises(SchemaConformanceError):
        read_csv(spark, f"{csv_dir}/*_feed.csv", required_cols=["material", "value", "bu"])


def test_read_csv_skiprows(spark, tmp_path):
    p = tmp_path / "report.csv"
    p.write_text("JUNK LINE\nANOTHER\nmaterial,value\nA,1\n")
    df = read_csv(spark, str(p), skip_rows=2)
    rows = df.collect()
    assert df.columns == ["material", "value"]
    assert rows[0]["material"] == "A"


def test_find_latest_prefers_filename_date(csv_dir):
    # mtime says junk_feed.csv is newest, but dated names win
    latest = find_latest_by_pattern(f"{csv_dir}/*_feed.csv")
    assert os.path.basename(latest) == "20240301_feed.csv"


def test_read_auto_parquet(spark, sf_dir):
    df = read_auto(spark, f"{sf_dir}/nation.parquet")
    assert df.count() == 25


def test_write_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    out = str(tmp_path / "out")
    write_csv(df, out, single_file=True)
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == 2


def test_upsert_delta_rows_writes_only_changes(spark, tmp_path):
    target = str(tmp_path / "target")
    old = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["k", "v"])
    old.write.parquet(target)
    new = spark.createDataFrame([(1, 10.0), (2, 25.0), (3, 30.0)], ["k", "v"])

    written = []
    n = upsert_delta_rows(
        new,
        read_existing=lambda: spark.read.parquet(target),
        write_changed=lambda df: written.append(df.collect()),
        pk=["k"],
        compare_cols=["v"],
    )
    assert n == 2
    keys = sorted(r["k"] for r in written[0])
    assert keys == [2, 3]


FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


def test_detect_header_row_finds_marker_row():
    from machine_learning_with_spark_streaming_spark.sources.files import detect_header_row

    path = os.path.join(FIXTURE_DIR, "messy_feed.csv")
    assert detect_header_row(path) == 2


def test_detect_header_row_clean_file_is_zero(csv_dir):
    from machine_learning_with_spark_streaming_spark.sources.files import detect_header_row

    # no marker row in the first 10 lines -> default 0 (clean export)
    assert detect_header_row(str(csv_dir / "junk_feed.csv")) == 0


def test_read_csv_detect_header_skips_preamble(spark):
    df = read_csv(
        spark, os.path.join(FIXTURE_DIR, "messy_feed.csv"), detect_header=True
    )
    assert "Sales Organization" in df.columns
    assert df.count() == 60


def test_pick_col_and_resolve_columns(spark):
    from machine_learning_with_spark_streaming_spark.sources.files import pick_col, resolve_columns

    df = spark.createDataFrame([(1, "x")], ["Material Number", "Country"])
    assert pick_col(df, ["Material", "Material Number"]) == "Material Number"
    assert pick_col(df, ["Missing"], required=False) is None
    with pytest.raises(KeyError):
        pick_col(df, ["Missing"])
    out = resolve_columns(df, {"material": ["Material", "Material Number"]})
    assert out.columns == ["material", "Country"]
    # canonical already present -> untouched
    again = resolve_columns(out, {"material": ["Material Number"]})
    assert again.columns == ["material", "Country"]


def test_jobspec_col_candidates_resolution(spark):
    from machine_learning_with_spark_streaming_spark.plans.jobspec import JobSpec, run_job

    feed = spark.createDataFrame(
        [("M-1", 5.0)], ["Material Number", "Qty"]
    )
    spec = JobSpec(
        name="drifty",
        col_candidates={"material": ["Material", "Material Number"]},
        constants={"source": "t", "sales_organization": "s", "country": "c",
                   "bu": "b", "snapshot": None, "attribute": None},
        value_col="Qty",
    )
    out = run_job(feed, spec)
    assert out.select("material").first()[0] == "M-1"


def test_xlsx_roundtrip_and_excel_read(spark, tmp_path):
    # S2 executes for real: stdlib writer -> stdlib reader -> Spark DF
    from machine_learning_with_spark_streaming_spark.sources.files import read_excel_via_pandas
    from machine_learning_with_spark_streaming_spark.sources.xlsx import read_xlsx_rows, sheet_names, write_xlsx

    path = str(tmp_path / "lookup.xlsx")
    rows = [
        ["Material", "Country", "Factor", "Active"],
        ["M-1", "Germany", 1.5, True],
        ["M-2", "France & Co <x>", 2.0, False],
        ["M-3", None, 0.25, True],
    ]
    write_xlsx(path, rows, sheet_name="Mapping")
    assert sheet_names(path) == ["Mapping"]
    back = read_xlsx_rows(path)
    assert back[0] == rows[0]
    assert back[1] == ["M-1", "Germany", 1.5, True]
    assert back[2][1] == "France & Co <x>"  # xml-escaped round trip
    assert back[3][1] is None  # sparse cell -> gap preserved

    df = read_excel_via_pandas(spark, path, sheet_name="Mapping")
    assert df.columns == ["Material", "Country", "Factor", "Active"]
    assert df.count() == 3
    got = {r.Material: r.Factor for r in df.collect()}
    assert got == {"M-1": 1.5, "M-2": 2.0, "M-3": 0.25}


def test_read_auto_dispatches_xlsx(spark, tmp_path):
    from machine_learning_with_spark_streaming_spark.sources.xlsx import write_xlsx

    path = str(tmp_path / "t.xlsx")
    write_xlsx(path, [["k", "v"], ["a", 1.0]])
    df = read_auto(spark, path)
    assert df.count() == 1


def test_delete_where_and_truncate(spark, tmp_path):
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.sources.maintenance import delete_where, truncate

    path = str(tmp_path / "fact")
    spark.range(100).withColumn("v", F.col("id") * 2).write.parquet(path)
    n = delete_where(spark, path, F.col("id") % 10 == 0)
    assert n == 10
    back = spark.read.parquet(path)
    assert back.count() == 90
    assert back.filter(F.col("id") % 10 == 0).count() == 0
    truncate(spark, path)
    empty = spark.read.parquet(path)
    assert empty.count() == 0
    assert set(empty.columns) == {"id", "v"}


def test_delete_partitions_is_metadata_only(spark, tmp_path):
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.sources.maintenance import delete_partitions

    path = str(tmp_path / "part_fact")
    df = spark.range(40).withColumn("snap", (F.col("id") % 4).cast("string"))
    df.write.partitionBy("snap").parquet(path)
    removed = delete_partitions(path, "snap", ["1", "3", "9"])
    assert removed == 2  # '9' never existed
    back = spark.read.parquet(path)
    assert back.count() == 20
    # partition values are type-inferred on read (string dirs -> int)
    assert {str(r.snap) for r in back.select("snap").distinct().collect()} == {"0", "2"}


def test_duplicate_column_positional_selection(spark):
    from machine_learning_with_spark_streaming_spark.sources.files import dedupe_column_names, select_duplicate_columns

    df = spark.createDataFrame(
        [("org1", "US", "DE", "M-1")], ["Sales Organization", "Country", "Country", "Material"]
    )
    deduped = dedupe_column_names(df)
    assert deduped.columns == [
        "Sales Organization", "Country", "Country__dup1", "Material"
    ]
    out = select_duplicate_columns(
        df,
        {
            "sales_organization": ("Sales Organization", 0),
            "country": ("Country", 1),  # SAP GERS: the second Country wins
            "material": ("Material", 0),
        },
    )
    row = out.first()
    assert (row.sales_organization, row.country, row.material) == ("org1", "DE", "M-1")
    import pytest as _pytest

    with _pytest.raises(KeyError):
        select_duplicate_columns(df, {"x": ("Missing", 0)})
    with _pytest.raises(IndexError):
        select_duplicate_columns(df, {"x": ("Material", 1)})


def test_compact_files_preserves_rows_and_reduces_files(spark, tmp_path):
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.sources.maintenance import compact_files

    path = str(tmp_path / "fragmented")
    # simulate micro-batch fragmentation: 40 tiny files
    spark.range(2000).withColumn("v", F.col("id") * 3).repartition(40).write.parquet(path)
    rows_before = {tuple(r) for r in spark.read.parquet(path).collect()}
    before, after = compact_files(spark, path, target_file_bytes=1 << 30)
    assert before >= 40
    assert after == 1  # total bytes << target -> single file
    back = spark.read.parquet(path)
    assert {tuple(r) for r in back.collect()} == rows_before


def test_compact_files_partitioned_keeps_layout(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.sources.maintenance import compact_files

    path = str(tmp_path / "part_fragmented")
    df = spark.range(400).withColumn("snap", (F.col("id") % 2).cast("string"))
    df.repartition(10).write.partitionBy("snap").parquet(path)
    rows_before = {tuple(r) for r in spark.read.parquet(path).collect()}
    before, after = compact_files(
        spark, path, target_file_bytes=1 << 30, partition_col="snap"
    )
    assert after < before
    # partition directories survive (pruning still works)
    assert sorted(
        d for d in os.listdir(path) if d.startswith("snap=")
    ) == ["snap=0", "snap=1"]
    assert {tuple(r) for r in spark.read.parquet(path).collect()} == rows_before


def test_rollup_merge_matches_full_recompute(spark, sf_dir):
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.rollup_maintenance import (
        build_rollup,
        merge_rollup,
    )
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    orders = load_table(spark, sf_dir, "orders")
    measures = {
        "n": ("count", F.lit(1)),
        "s": ("sum", F.col("o_totalprice").cast("decimal(18,2)")),
        "lo": ("min", F.col("o_totalprice")),
        "hi": ("max", F.col("o_totalprice")),
    }
    keys = ["o_orderpriority", "o_orderstatus"]
    full = {tuple(r) for r in build_rollup(orders, keys, measures).collect()}
    base = orders.filter(F.col("o_orderkey") % 7 != 0)
    delta = orders.filter(F.col("o_orderkey") % 7 == 0)
    merged = merge_rollup(build_rollup(base, keys, measures), delta, keys, measures)
    assert {tuple(r) for r in merged.collect()} == full


def test_rollup_merge_delta_only_groups(spark):
    # a group that exists only in the delta must appear in the merge
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.rollup_maintenance import (
        build_rollup,
        merge_rollup,
    )

    measures = {"n": ("count", F.lit(1)), "s": ("sum", F.col("v"))}
    base = spark.createDataFrame([("a", 1.0), ("a", 2.0)], ["k", "v"])
    delta = spark.createDataFrame([("b", 5.0), ("a", 3.0)], ["k", "v"])
    out = {
        (r.k, r.n, r.s)
        for r in merge_rollup(
            build_rollup(base, ["k"], measures), delta, ["k"], measures
        ).collect()
    }
    assert out == {("a", 3, 6.0), ("b", 1, 5.0)}


def test_write_excel_roundtrip_and_cap(spark, tmp_path):
    import pytest as _pytest

    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.sources.files import read_excel_via_pandas, write_excel

    df = spark.range(5).select(
        F.col("id"), (F.col("id") * 1.5).alias("v"), F.lit("x").alias("tag")
    )
    path = str(tmp_path / "report.xlsx")
    n = write_excel(df, path, sheet_name="Report")
    assert n == 5
    back = read_excel_via_pandas(spark, path)
    assert back.count() == 5
    assert set(back.columns) == {"id", "v", "tag"}
    with _pytest.raises(ValueError, match="cap"):
        write_excel(spark.range(100), str(tmp_path / "big.xlsx"), max_rows=10)


def test_notification_rows_and_foreach_batch_hook(spark, tmp_path):
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.sources.notify import (
        append_notifications,
        foreach_batch_notify,
        notification_rows,
    )

    verdicts = spark.createDataFrame(
        [("m1", "PASS", 0.01), ("m2", "FAIL", 0.4), ("m3", "FAIL", 0.2)],
        ["metric", "verdict", "drift"],
    )
    notes = notification_rows(
        verdicts, F.col("verdict") == "FAIL", "qc failed", ["metric", "drift"]
    )
    got = {r.body for r in notes.collect()}
    assert got == {"metric=m2 drift=0.4", "metric=m3 drift=0.2"}
    assert {r.severity for r in notes.collect()} == {"ERROR"}

    sink = str(tmp_path / "notifications")
    n = append_notifications(notes, sink)
    assert n == 2
    assert spark.read.parquet(sink).count() == 2

    # streaming path: the hook appends per batch with batch_id lineage
    src = str(tmp_path / "verdict_stream")
    verdicts.repartition(1).write.parquet(src)
    stream = spark.readStream.schema(verdicts.schema).parquet(src)
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_notify(
                F.col("verdict") == "FAIL", "qc failed", ["metric"], sink
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(sink)
    assert back.count() == 4  # 2 batch + 2 streamed


def test_compact_files_partitioned_splits_big_partitions(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.sources.maintenance import compact_files

    path = str(tmp_path / "hot_part")
    # one partition value holding all rows, fragmented into 20 files
    df = spark.range(50000).withColumn("snap", F.lit("hot")).withColumn(
        "payload", F.sha2(F.col("id").cast("string"), 256)
    )
    df.repartition(20).write.partitionBy("snap").parquet(path)
    rows_before = spark.read.parquet(path).count()
    # tiny target forces the single hot partition to split across files
    before, after = compact_files(
        spark, path, target_file_bytes=256 * 1024, partition_col="snap"
    )
    hot_dir = os.path.join(path, "snap=hot")
    n_files = sum(1 for f in os.listdir(hot_dir) if f.endswith(".parquet"))
    assert n_files > 1  # NOT one giant file per partition dir
    assert spark.read.parquet(path).count() == rows_before


def test_write_excel_non_finite_floats(spark, tmp_path):
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.sources.files import read_excel_via_pandas, write_excel

    df = spark.createDataFrame(
        [(1, float("nan")), (2, float("inf")), (3, 1.5)], ["id", "v"]
    )
    path = str(tmp_path / "nonfinite.xlsx")
    assert write_excel(df, path) == 3
    back = read_excel_via_pandas(spark, path)
    assert back.count() == 3  # readable workbook, not corrupt XML


def test_rollup_merge_preserves_null_sums(spark):
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.rollup_maintenance import (
        build_rollup,
        merge_rollup,
    )

    measures = {"s": ("sum", F.col("v"))}
    base = spark.createDataFrame(
        [("a", None), ("a", None), ("b", 1.0)], "k string, v double"
    )
    delta = spark.createDataFrame([("c", 2.0)], "k string, v double")
    out = {
        (r.k, r.s)
        for r in merge_rollup(
            build_rollup(base, ["k"], measures), delta, ["k"], measures
        ).collect()
    }
    # SUM over all-NULL stays NULL through the merge (matches recompute)
    assert out == {("a", None), ("b", 1.0), ("c", 2.0)}


def test_orc_roundtrip_via_read_auto(spark, tmp_path):
    from machine_learning_with_spark_streaming_spark.sources.files import read_auto

    out = str(tmp_path / "t.orc")
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    df.write.mode("overwrite").orc(out)
    back = read_auto(spark, out)
    assert back.count() == 100
    assert {r["id"]: r["v"] for r in back.collect()} == {i: 2 * i for i in range(100)}


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """A lake directory whose older files lack a newly added column must
    read with mergeSchema: union schema, NULLs for the missing column in
    old files — the append-only schema-evolution contract."""
    old = spark.createDataFrame([(1, "a")], "id long, name string")
    new = spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    )
    old.write.parquet(str(tmp_path / "t"), mode="append")
    new.write.parquet(str(tmp_path / "t"), mode="append")
    merged = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "t"))
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows == {1: None, 2: 9.5}


def test_corrupt_json_lines_quarantined_not_fatal(spark, tmp_path):
    """PERMISSIVE JSON ingest: malformed lines land in _corrupt_record
    instead of failing the job — the quarantine half of the K8
    error-side-output contract at the parser level."""
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "v": "ok"}\n'
        "{broken json!!\n"
        '{"id": 3, "v": "also ok"}\n'
    )
    df = (
        spark.read.schema("id long, v string, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    rows = df.collect()
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert {r.id for r in good} == {1, 3}
    assert len(bad) == 1 and "broken" in bad[0]._corrupt_record


def test_swap_into_place_is_atomic_exchange(tmp_path):
    """The maintenance swap must use renameat2(RENAME_EXCHANGE) on
    Linux: the table path resolves to old or new content at every
    instant, never to a missing directory. Pin both the exchange
    semantics and that this kernel actually takes the atomic path."""
    import os

    from machine_learning_with_spark_streaming_spark.sources.maintenance import (
        _renameat2_exchange,
        _swap_into_place,
    )

    table = tmp_path / "tbl"
    staging = tmp_path / "tbl__staging_x"
    table.mkdir(); (table / "old.parquet").write_text("old")
    staging.mkdir(); (staging / "new.parquet").write_text("new")
    assert _renameat2_exchange(str(table), str(table)) or True  # probe ok
    _swap_into_place(str(table), str(staging))
    assert (table / "new.parquet").read_text() == "new"
    assert not staging.exists()  # old data removed
    # on this Linux the atomic syscall itself must be available
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(); b.mkdir(); (a / "f").write_text("a"); (b / "f").write_text("b")
    assert os.uname().sysname != "Linux" or _renameat2_exchange(
        str(a), str(b)
    )
    if (a / "f").read_text() == "b":
        assert (b / "f").read_text() == "a"


def test_smtp_transport_sends_one_summary_message(spark):
    """K7 transport against a REAL (in-process) SMTP conversation: the
    adapter must deliver one MIME message whose envelope covers to+cc
    and whose body carries one line per notification record; an empty
    batch sends nothing; an alert storm past the cap refuses."""
    import socket
    import socketserver
    import threading

    import pytest
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.sources.notify import (
        notification_rows,
        send_notifications_smtp,
    )

    mailbox = {}

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            def send(line):
                self.wfile.write((line + "\r\n").encode())

            send("220 test ESMTP")
            data_mode, data, envelope = False, [], []
            while True:
                raw = self.rfile.readline()
                if not raw:
                    break
                line = raw.decode("utf-8", "replace").rstrip("\r\n")
                if data_mode:
                    if line == ".":
                        data_mode = False
                        mailbox["data"] = "\n".join(data)
                        mailbox["envelope"] = list(envelope)
                        send("250 OK")
                    else:
                        data.append(line[1:] if line.startswith("..") else line)
                    continue
                verb = line.split(":")[0].split(" ")[0].upper()
                if verb in ("EHLO", "HELO"):
                    send("250 test")
                elif verb in ("MAIL", "RCPT"):
                    envelope.append(line)
                    send("250 OK")
                elif verb == "DATA":
                    data_mode = True
                    send("354 go")
                elif verb == "QUIT":
                    send("221 bye")
                    break
                else:
                    send("250 OK")

    with socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler) as srv:
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            df = spark.createDataFrame(
                [(1, 120.0), (2, None), (3, 20.0)],
                "id int, value double",
            )
            recs = notification_rows(
                df,
                F.col("value").isNull() | (F.col("value") > 100),
                "qc gate failed",
                ["id", "value"],
            )
            n = send_notifications_smtp(
                recs, "127.0.0.1", port, "engine@local",
                to=["oncall@local"], cc=["lead@local"],
            )
            assert n == 2
            body = mailbox["data"]
            assert "id=1 value=120.0" in body
            assert "id=2 value=null" in body  # NULL-safe k=v assembly
            assert "Subject: ERROR: qc gate failed (2 records)" in body
            # stable orderBy before the capped collect: body line order is
            # deterministic, not partition-arrival order
            assert body.index("id=1 value=120.0") < body.index("id=2 value=null")
            env = " ".join(mailbox["envelope"])
            assert "oncall@local" in env and "lead@local" in env

            empty = recs.filter(F.lit(False))
            assert send_notifications_smtp(
                empty, "127.0.0.1", port, "a@b", to=["c@d"]
            ) == 0
            with pytest.raises(ValueError, match="max_records"):
                send_notifications_smtp(
                    recs, "127.0.0.1", port, "a@b", to=["c@d"], max_records=1
                )
        finally:
            srv.shutdown()


def test_manifest_detects_row_loss_and_duplication(spark, tmp_path):
    """K9 integrity contract: the manifest validator passes on the
    intact table and fails when a row is lost OR duplicated — the
    order-independent checksum moves either way, which a plain row
    count alone would miss for a paired lose-one-duplicate-one
    corruption."""
    from machine_learning_with_spark_streaming_spark.sources.maintenance import (
        validate_manifest,
        write_with_manifest,
    )

    df = spark.createDataFrame([(i,) for i in range(100)], "k long")
    path = str(tmp_path / "t")
    write_with_manifest(df, path, "k")
    *_, ok = validate_manifest(spark, path, "k")
    assert ok

    # corruption 1: drop a row (count AND checksum both move)
    broken = spark.read.parquet(path).filter("k <> 7")
    broken.write.mode("overwrite").parquet(str(tmp_path / "b1"))
    import shutil

    shutil.copytree(f"{path}_manifest", str(tmp_path / "b1_manifest"))
    n, c, mn, mc, ok1 = validate_manifest(spark, str(tmp_path / "b1"), "k")
    assert not ok1 and n == mn - 1

    # corruption 2: same COUNT, different rows (drop 7, duplicate 8) —
    # only the checksum catches it
    b2 = spark.read.parquet(path).filter("k <> 7").unionAll(
        spark.createDataFrame([(8,)], "k long")
    )
    b2.write.mode("overwrite").parquet(str(tmp_path / "b2"))
    shutil.copytree(f"{path}_manifest", str(tmp_path / "b2_manifest"))
    n2, c2, mn2, mc2, ok2 = validate_manifest(spark, str(tmp_path / "b2"), "k")
    assert n2 == mn2 and not ok2 and c2 != mc2
