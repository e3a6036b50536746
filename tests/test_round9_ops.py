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
