

def test_gap_fill_locf_carries_forward(spark):
    from datetime import datetime

    from machine_learning_with_spark_streaming_spark.operators.reshape import gap_fill_locf

    rows = [
        (1, datetime(2024, 1, 1, 5), 10.0),
        (1, datetime(2024, 1, 1, 9), 5.0),   # same day -> summed
        (1, datetime(2024, 1, 4, 0), 7.0),   # 2-day gap
        (2, datetime(2024, 1, 2, 0), 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {
        (r["user_id"], str(r["day"])): (r["observed"], r["filled_value"])
        for r in gap_fill_locf(df, "user_id", "ts", "value").collect()
    }
    assert out[(1, "2024-01-01")] == (1, 15.0)
    assert out[(1, "2024-01-02")] == (0, 15.0)  # carried
    assert out[(1, "2024-01-03")] == (0, 15.0)  # carried
    assert out[(1, "2024-01-04")] == (1, 7.0)
    assert out[(2, "2024-01-02")] == (1, 1.0)
    assert len(out) == 5  # user 2 has a single-day span


def test_linear_interpolation_exact_integer_fills(spark):
    from machine_learning_with_spark_streaming_spark.operators.reshape import gap_fill_interpolate

    rows = [
        (1, "2024-01-01 00:00:00", 1.00),   # day 0: 100 cents
        (1, "2024-01-04 00:00:00", 4.00),   # day 3: 400 -> gap fills 200, 300
        (1, "2024-01-06 00:00:00", 1.00),   # descending leg: floor division
        (2, "2024-02-10 00:00:00", 5.00),   # single point: flat
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double")
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    got = {
        (r.user_id, str(r.day)): (r.observed, r.interp_cents)
        for r in gap_fill_interpolate(df, "user_id", "ts", "value").collect()
    }
    assert got[(1, "2024-01-01")] == (1, 100)
    assert got[(1, "2024-01-02")] == (0, 200)
    assert got[(1, "2024-01-03")] == (0, 300)
    assert got[(1, "2024-01-04")] == (1, 400)
    # 400 -> 100 over 2 days: midpoint floor((100-400)*1/2) = -150
    assert got[(1, "2024-01-05")] == (0, 250)
    assert got[(1, "2024-01-06")] == (1, 100)
    assert got[(2, "2024-02-10")] == (1, 500)
