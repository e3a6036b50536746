"""Round-9 additions: per-key alpha-grid forecaster selection and the
IVF ANN serving stream with per-batch recall accounting."""

from __future__ import annotations

import datetime as dt


def test_alpha_grid_single_point_equals_fixed_backtest(spark, sf_dir):
    """With a one-point grid {0.5}, the grid selector degenerates to
    the fixed-alpha w14 backtest: identical n_pairs, MAE and bias for
    every key (the grid machinery adds selection, not new smoothing
    math)."""
    from machine_learning_with_spark_streaming_spark.operators.forecast import holt_alpha_grid
    from machine_learning_with_spark_streaming_spark.operators.windows import forecast_backtest
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    ev = load_table(spark, sf_dir, "events")
    grid = {
        r["event_type"]: r
        for r in holt_alpha_grid(
            ev, "event_type", "ts", "value", alphas=(0.5,)
        ).collect()
    }
    fixed = {
        r["event_type"]: r
        for r in forecast_backtest(ev, "event_type", "ts", "value").collect()
    }
    assert set(grid) == set(fixed) and len(grid) > 0
    for k, g in grid.items():
        f = fixed[k]
        assert g["best_alpha_permille"] == 500
        assert g["n_pairs"] == f["n_pairs"]
        assert g["mae_micros"] == f["mae_micros"]
        assert g["bias_micros"] == f["bias_micros"]


def test_alpha_grid_constant_series_ties_to_smallest(spark):
    """A constant series forecasts exactly at every alpha (MAE 0 for
    all grid points), so the tie rule picks the smallest alpha."""
    from machine_learning_with_spark_streaming_spark.operators.forecast import (
        ALPHA_GRID,
        holt_alpha_grid,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [("c", base + dt.timedelta(days=i), 5.0) for i in range(12)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = holt_alpha_grid(df, "event_type", "ts", "value").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_pairs"] == 11
    assert r["mae_micros"] == 0 and r["bias_micros"] == 0
    assert r["best_alpha_permille"] == int(round(min(ALPHA_GRID) * 1000))


def test_alpha_grid_oscillating_series_prefers_heavy_smoothing(spark):
    """An alternating 0/10 series has a constant mean: the mild
    smoother (alpha=0.3) damps the oscillation and beats the
    aggressive one (alpha=0.7), which chases the last observation.
    The selector must pick 300, and its reported MAE must be strictly
    below the 0.7 grid point's (re-derived via a one-point grid)."""
    from machine_learning_with_spark_streaming_spark.operators.forecast import holt_alpha_grid

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("z", base + dt.timedelta(days=i), 10.0 * (i % 2)) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    picked = holt_alpha_grid(df, "event_type", "ts", "value").collect()[0]
    assert picked["best_alpha_permille"] == 300
    hi = holt_alpha_grid(df, "event_type", "ts", "value", alphas=(0.7,)).collect()[0]
    assert picked["mae_micros"] < hi["mae_micros"]


def test_alpha_grid_plan_two_windows_one_exchange_chain(spark, sf_dir):
    """The whole grid is planned as sibling expressions inside two
    Window operators over one key partitioning — adding grid points
    must not add exchanges. Exactly one Exchange feeds the window
    chain (the daily rollup's), plus one for the final per-key agg."""
    from machine_learning_with_spark_streaming_spark.operators.forecast import holt_alpha_grid
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    ev = load_table(spark, sf_dir, "events")
    plan = (
        holt_alpha_grid(ev, "event_type", "ts", "value")
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_window = plan.count("Window")
    assert n_window == 2, plan
    n_exchange = plan.count("Exchange")
    # daily-rollup hashpartitioning + final groupBy partial/final agg
    assert n_exchange <= 3, plan


def test_ivf_serving_stream_batches_and_recall_bounds(spark, sf_dir):
    """The serving stream really runs 3 micro-batches of 4 queries and
    each batch's recall accounting is internally consistent:
    n_hits <= n_queries*k and recall_permille is the exact integer
    floor of 1000*n_hits/(n_queries*k)."""
    from machine_learning_with_spark_streaming_spark.operators.similarity import TOP_K
    from machine_learning_with_spark_streaming_spark.streaming.serving import (
        q_ivf_serving_stream,
    )

    rows = q_ivf_serving_stream(spark, sf_dir).collect()
    assert [r["batch_idx"] for r in rows] == [0, 1, 2]
    for r in rows:
        assert r["n_queries"] == 4
        assert 0 <= r["n_hits"] <= r["n_queries"] * TOP_K
        assert r["recall_permille"] == (1000 * r["n_hits"]) // (
            r["n_queries"] * TOP_K
        )


def test_seasonal_index_planted_weekdays(spark):
    """2024-01-01 is a Monday: plant Monday=2.0 and Tuesday=4.0 events
    (two each) -> overall mean 3.0, indices 2/3 and 4/3."""
    import datetime as dt

    from machine_learning_with_spark_streaming_spark.operators.seasonal import seasonal_index

    mon, tue = dt.datetime(2024, 1, 1, 9), dt.datetime(2024, 1, 2, 9)
    rows = [("a", mon, 2.0), ("a", mon, 2.0), ("a", tue, 4.0), ("a", tue, 4.0)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = {r["dow"]: r for r in seasonal_index(df, "event_type", "ts", "value").collect()}
    assert set(out) == {0, 1}
    assert out[0]["n_events"] == 2 and out[0]["dow_mean"] == 2.0
    assert out[1]["dow_mean"] == 4.0
    assert out[0]["seasonal_index"] == round(2.0 / 3.0, 6)
    assert out[1]["seasonal_index"] == round(4.0 / 3.0, 6)


def test_seasonal_naive_backtest_planted(spark):
    """Constant series: t-7 forecasts exactly (MAE 0). Linear ramp of
    1/day: every pair errs by exactly 7 units = 7,000,000 micros."""
    import datetime as dt

    from machine_learning_with_spark_streaming_spark.operators.seasonal import (
        seasonal_naive_backtest,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [("c", base + dt.timedelta(days=i), 5.0) for i in range(14)]
    rows += [("r", base + dt.timedelta(days=i), 1.0 * i) for i in range(14)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = {
        r["event_type"]: r
        for r in seasonal_naive_backtest(df, "event_type", "ts", "value").collect()
    }
    assert out["c"]["n_pairs"] == 7 and out["c"]["mae_micros"] == 0
    assert out["r"]["n_pairs"] == 7
    assert out["r"]["mae_micros"] == 7_000_000
    assert out["r"]["bias_micros"] == 7_000_000


def test_seasonal_naive_skips_gap_days(spark):
    """A day whose t-7 partner is missing contributes no pair."""
    import datetime as dt

    from machine_learning_with_spark_streaming_spark.operators.seasonal import (
        seasonal_naive_backtest,
    )

    base = dt.datetime(2024, 1, 1)
    days = [0, 7, 9]  # day 9's partner (day 2) is absent
    rows = [("g", base + dt.timedelta(days=i), 1.0) for i in days]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = seasonal_naive_backtest(df, "event_type", "ts", "value").collect()
    assert len(out) == 1 and out[0]["n_pairs"] == 1


def test_ivf_cell_stats_partition_of_corpus(spark, sf_dir):
    """The 16 cells partition the corpus: counts sum to the corpus
    size, every cell appears exactly once, shares floor-sum to <=1000."""
    from machine_learning_with_spark_streaming_spark.operators.index_health import (
        ivf_cell_stats,
    )
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = ivf_cell_stats(emb).collect()
    assert sorted(r["cell"] for r in rows) == list(range(16))
    assert sum(r["n_vectors"] for r in rows) == emb.count()
    share = sum(r["share_permille"] for r in rows)
    assert 1000 - 16 <= share <= 1000


def test_centroid_outliers_planted_flip(spark):
    """Three near-identical vectors plus one sign-flipped vector in the
    same label: the flipped one is rank 1 with strongly negative cos."""
    from machine_learning_with_spark_streaming_spark.operators.index_health import (
        centroid_outliers,
    )

    rows = [
        (0, 1, [1.0, 0.1]),
        (0, 2, [1.0, 0.0]),
        (0, 3, [0.9, 0.1]),
        (0, 4, [-1.0, -0.1]),
    ]
    df = spark.createDataFrame(
        rows, "label int, vec_id long, embedding array<float>"
    )
    out = centroid_outliers(df, k=2).collect()
    assert [r["rank"] for r in out] == [1, 2]
    assert out[0]["vec_id"] == 4 and out[0]["cos"] < -0.5
    assert out[0]["cos"] <= out[1]["cos"]


def test_centroid_outliers_k_per_label(spark, sf_dir):
    """Real data: exactly k rows per label, ranked by ascending cosine
    with ranks contiguous from 1."""
    from machine_learning_with_spark_streaming_spark.operators.index_health import (
        OUTLIER_K,
        centroid_outliers,
    )
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = centroid_outliers(emb).collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r)
    for label, rs in by_label.items():
        assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] == list(
            range(1, OUTLIER_K + 1)
        )
        coss = [r["cos"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert coss == sorted(coss)


def test_argmax_assign_matches_jvm_reference(spark):
    """The Arrow/numpy assignment is IEEE-identical to the JVM
    crossJoin + row_number reference it replaced: same cell AND same
    winning cosine for every row of a seeded random corpus (including
    a zero vector, which assigns to cell 0 with NULL similarity)."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.functions.vectors import (
        as_double_array,
        cosine_similarity,
    )
    from machine_learning_with_spark_streaming_spark.operators.ivf import argmax_assign

    rng = random.Random(1234)
    dim, k, n = 16, 5, 300
    cents = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(k)]
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]
    rows.append((n, [0.0] * dim))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    fast = {
        r["id"]: (r["cell"], r["csim"])
        for r in argmax_assign(
            df, cents, cell_col="cell", sim_col="csim"
        ).collect()
    }

    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        "cell int, centroid array<double>",
    )
    ref_rows = (
        df.select(
            F.col("vec_id").alias("id"), as_double_array("embedding").alias("v")
        )
        .crossJoin(F.broadcast(cent_df))
        .withColumn("sim", cosine_similarity(F.col("v"), F.col("centroid")))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("id").orderBy(F.desc("sim"), F.asc("cell"))
            ),
        )
        .filter(F.col("rn") == 1)
        .collect()
    )
    assert len(fast) == n + 1
    for r in ref_rows:
        cell, csim = fast[r["id"]]
        assert cell == r["cell"], (r["id"], cell, r["cell"])
        if r["sim"] is None:
            assert csim is None and cell == 0
        else:
            assert csim == r["sim"], (r["id"], csim, r["sim"])  # bit-equal


def test_cusum_changepoint_planted_level_shift(spark):
    """10 days at 10.0 then 10 days at 20.0: ref=15, dev=±5e6 micros,
    cusum walks to -50e6 and back; with MAD=5e6 and h=4 the flagged
    run is days 5..15 (|cusum| > 20e6), first flag 2024-01-05."""
    import datetime as dt

    from machine_learning_with_spark_streaming_spark.operators.seasonal import (
        cusum_changepoints,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [("s", base + dt.timedelta(days=i), 10.0) for i in range(10)]
    rows += [("s", base + dt.timedelta(days=10 + i), 20.0) for i in range(10)]
    rows += [("c", base + dt.timedelta(days=i), 7.0) for i in range(20)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = {
        r["event_type"]: r
        for r in cusum_changepoints(df, "event_type", "ts", "value").collect()
    }
    s = out["s"]
    assert s["n_days"] == 20
    assert s["ref_micros"] == 15_000_000
    assert s["mad_micros"] == 5_000_000
    assert s["max_abs_cusum"] == 50_000_000
    assert s["n_changepoint_days"] == 11
    assert str(s["first_changepoint_day"]) == "2024-01-05"
    c = out["c"]
    assert c["max_abs_cusum"] == 0 and c["n_changepoint_days"] == 0
    assert c["first_changepoint_day"] is None


def test_cell_partitioned_corpus_prunes_probe_reads(spark, sf_dir, tmp_path):
    """The IVF scale story made concrete: the assigned corpus stored
    partitioned by cell serves a probe of nprobe cells with partition
    pruning (PartitionFilters in the scan, only the probed directories
    read) — the layout a 100 TB deployment writes at ingest."""
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.ivf import assign_cells
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "corpus_by_cell")
    assign_cells(emb).write.partitionBy("cell").parquet(path)

    probed = spark.read.parquet(path).filter(F.col("cell").isin(3, 7))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan, plan
    # the filter really prunes: only the two probed cells come back
    cells = {r["cell"] for r in probed.select("cell").distinct().collect()}
    assert cells <= {3, 7}
    full = {r["cell"] for r in spark.read.parquet(path)
            .select("cell").distinct().collect()}
    assert len(full) == 16


def test_cusum_monitor_stream_converges_to_batch_operator(spark, sf_dir):
    """The streaming monitor's final cumulative position per key equals
    the batch w18 report computed over the full series (same frozen
    reference = full-series ref/MAD): days seen, alarm count. Rows per
    key are strictly increasing in days seen — real state carry across
    the 3 micro-batches, not a single-batch recomputation."""
    from machine_learning_with_spark_streaming_spark.operators.seasonal import (
        cusum_changepoints,
    )
    from machine_learning_with_spark_streaming_spark.schemas import load_table
    from machine_learning_with_spark_streaming_spark.streaming.monitor import (
        N_MONITOR_BATCHES,
        q_cusum_monitor_stream,
    )

    rows = q_cusum_monitor_stream(spark, sf_dir).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["event_type"], []).append(r)

    ev = load_table(spark, sf_dir, "events")
    w18 = {
        r["event_type"]: r
        for r in cusum_changepoints(ev, "event_type", "ts", "value").collect()
    }
    assert set(by_key) == set(w18)
    for k, rs in by_key.items():
        rs = sorted(rs, key=lambda r: r["n_days_seen"])
        assert 1 <= len(rs) <= N_MONITOR_BATCHES
        seen = [r["n_days_seen"] for r in rs]
        assert seen == sorted(set(seen))  # strictly increasing
        final = rs[-1]
        assert final["n_days_seen"] == w18[k]["n_days"]
        assert final["n_flagged_total"] == w18[k]["n_changepoint_days"]


def test_cusum_deseasonalized_ignores_pure_weekly_pattern(spark):
    """4 complete weeks of a pure weekday sawtooth deseasonalize to
    exactly zero deviations (dow means are exact): no flags, zero MAD,
    zero cusum. The same sawtooth with a +10 level shift from week 3
    still alarms."""
    import datetime as dt

    from machine_learning_with_spark_streaming_spark.operators.seasonal import (
        cusum_deseasonalized,
    )

    base = dt.datetime(2024, 1, 1)  # a Monday
    saw = [70.0, 70.0, 70.0, 70.0, 70.0, 70.0, 0.0]  # strong dow pattern
    rows = []
    for i in range(28):
        rows.append(("p", base + dt.timedelta(days=i), saw[i % 7]))
        shift = 10.0 if i >= 14 else 0.0
        rows.append(("s", base + dt.timedelta(days=i), saw[i % 7] + shift))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = {
        r["event_type"]: r
        for r in cusum_deseasonalized(df, "event_type", "ts", "value").collect()
    }
    p = out["p"]
    assert p["n_days"] == 28
    assert p["mad_micros"] == 0 and p["max_abs_cusum"] == 0
    assert p["n_changepoint_days"] == 0 and p["first_changepoint_day"] is None
    s = out["s"]
    assert s["mad_micros"] == 5_000_000  # dev is exactly +-5 units
    assert s["n_changepoint_days"] > 0
    assert s["max_abs_cusum"] == 70_000_000  # 14 days x 5e6 walk


def test_cusum_monitor_state_survives_query_restart(spark, tmp_path):
    """The monitor's (cusum, days, alarms) state lives in the
    checkpoint: a second life of the query (same checkpoint, new
    staged days) CONTINUES the walk — days seen and alarms include the
    first life's, not a rebuild from the new files alone."""
    import datetime as dt
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from machine_learning_with_spark_streaming_spark.streaming.monitor import cusum_monitor

    stage = str(tmp_path / "stage")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stage)
    base = dt.date(2024, 1, 1)

    def put(idx, day_offsets):
        tbl = pa.table(
            {
                "event_type": pa.array(["k"] * len(day_offsets), pa.string()),
                "day": pa.array(
                    [base + dt.timedelta(days=o) for o in day_offsets],
                    pa.date32(),
                ),
                "mv": pa.array([10_000_000] * len(day_offsets), pa.int64()),
            }
        )
        p = os.path.join(stage, f"b{idx:03d}.parquet")
        pq.write_table(tbl, p)
        t = time.time() - 1000 + idx
        os.utime(p, (t, t))

    # ref 9.0, mad 1.0 units -> dev +1e6/day, threshold 4e6
    ref_mad = {"k": (9_000_000, 1_000_000)}

    out = str(tmp_path / "out")

    def run_once():
        stream = (
            spark.readStream.schema("event_type string, day date, mv long")
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            cusum_monitor(stream, ref_mad)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).collect()

    put(0, range(0, 6))  # days 1..6: cusum 1e6..6e6, flags at 5e6,6e6
    first = run_once()
    assert len(first) == 1
    assert first[0]["n_days_seen"] == 6
    assert first[0]["cusum_end"] == 6_000_000
    assert first[0]["n_flagged_total"] == 2

    put(1, range(6, 10))  # days 7..10 arrive after a query restart
    second = sorted(run_once(), key=lambda r: r["n_days_seen"])
    assert len(second) == 2  # first life's batches not reprocessed
    final = second[-1]
    assert final["n_days_seen"] == 10  # state carried, not rebuilt
    assert final["cusum_end"] == 10_000_000
    assert final["n_flagged_total"] == 6
