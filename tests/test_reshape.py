

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
