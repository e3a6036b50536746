

def test_scd2_compress_ranges(spark):
    from datetime import date

    from machine_learning_with_spark_streaming_spark.operators.windows import scd2_compress

    rows = [
        (1, date(2024, 1, 1), "A"),
        (1, date(2024, 2, 1), "A"),
        (1, date(2024, 3, 1), "B"),
        (1, date(2024, 4, 1), "A"),
        (2, date(2024, 1, 1), "X"),
    ]
    df = spark.createDataFrame(rows, "k long, snap date, v string")
    out = sorted(
        [tuple(r) for r in scd2_compress(df, "k", "snap", "v").collect()]
    )
    # key 1: A(Jan-Feb), B(Mar), A(Apr, current) -- re-appearing value
    # opens a NEW version, it never merges backward
    assert out == [
        (1, "A", date(2024, 1, 1), date(2024, 2, 1), 2, 0),
        (1, "A", date(2024, 4, 1), None, 1, 1),
        (1, "B", date(2024, 3, 1), date(2024, 3, 1), 1, 0),
        (2, "X", date(2024, 1, 1), None, 1, 1),
    ]
