"""Weekly seasonality: the reference's demand-planning shape, completed.

The reference disaggregates monthly demand to weeks with fixed factors
(packages/myConversionsClass.py:544 spreading) and forecasts per
material; what it never computes is the seasonality it implicitly
assumes. These operators close that loop distributed:

- ``seasonal_index``: per-key day-of-week multiplicative index — the
  factor table a planner would FEED to the reference's week spreading
  instead of flat quarters.
- ``seasonal_naive_backtest``: the honesty baseline for the w13/w14/w15
  forecaster family — forecast(t) = actual(t-7 days), the standard
  "seasonal naive" reference model (Hyndman & Athanasopoulos, FPP).
  A smoother that cannot beat this number is not earning its grid.

Cross-engine exactness: every sum that crosses a groupBy is integer
(cents or integer micro-errors), so no engine-ordered double summation
ever reaches the hash; the only double divisions happen on already-exact
integer aggregates and round to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from machine_learning_with_spark_streaming_spark.operators.windows import (
    _daily_mean_series,
)
from machine_learning_with_spark_streaming_spark.registry import register
from machine_learning_with_spark_streaming_spark.schemas import load_table


def seasonal_index(
    df: DataFrame, key: str, ts_col: str, value_col: str
) -> DataFrame:
    """Per-(key, day-of-week) multiplicative seasonal index.

    dow_mean = mean(value) over the key's events on that weekday,
    index = dow_mean / overall key mean — both from exact integer-cent
    sums, one double division each at the very end. dow is 0=Monday
    (Spark ``weekday`` == ISO dow - 1).

    Plan: ONE (key, dow) hash aggregate with map-side partials; the
    per-key totals re-aggregate the 7-row-per-key partials (no second
    scan), then a tiny self-join the optimizer broadcasts. At 100 TB
    the shuffle carries |keys|*7 integer rows."""
    base = (
        df.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .groupBy(
            F.col(key),
            F.weekday(F.to_date(ts_col)).alias("dow"),
        )
        .agg(
            F.sum(F.round(F.col(value_col) * 100).cast("long")).alias("__c"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    totals = base.groupBy(key).agg(
        F.sum("__c").alias("__tc"), F.sum("__n").alias("__tn")
    )
    dow_mean = F.col("__c") / 100.0 / F.col("__n")
    overall = F.col("__tc") / 100.0 / F.col("__tn")
    return base.join(F.broadcast(totals), key).select(
        F.col(key),
        F.col("dow").cast("int").alias("dow"),
        F.col("__n").alias("n_events"),
        F.round(dow_mean, 6).alias("dow_mean"),
        F.round(dow_mean / overall, 6).alias("seasonal_index"),
    )


def seasonal_naive_backtest(
    df: DataFrame, key: str, ts_col: str, value_col: str
) -> DataFrame:
    """Seasonal-naive one-step backtest: forecast(day) = daily mean at
    (day - 7), paired only when both days exist. Errors floor to
    integer micro-units before aggregation (the w14 contract), so the
    per-key MAE/bias report is engine-exact and directly comparable to
    ``forecast_backtest`` / ``holt_alpha_grid`` numbers.

    Plan: the shared daily rollup, then a self equi-join on
    (key, day-7) — co-partitioned on the key, no window needed."""
    daily = _daily_mean_series(df, key, ts_col, value_col).select(
        key, "day", "mean_value"
    )
    cur, prev = daily.alias("cur"), daily.alias("prev")
    err = F.round(
        (F.round(F.col("cur.mean_value"), 6) - F.round(F.col("prev.mean_value"), 6))
        * 1e6
    ).cast("long")
    paired = cur.join(
        prev,
        (F.col(f"cur.{key}") == F.col(f"prev.{key}"))
        & (F.col("prev.day") == F.date_sub(F.col("cur.day"), 7)),
    ).select(F.col(f"cur.{key}").alias(key), err.alias("__e"))
    return paired.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("sum(abs(__e)) div count(1)").alias("mae_micros"),
        F.expr("sum(__e) div count(1)").alias("bias_micros"),
    )


_SEASONAL_INDEX_ORACLE = """
WITH e AS (
  SELECT event_type, isodow(CAST(ts AS DATE)) - 1 AS dow,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
d AS (
  SELECT event_type, dow, sum(cents) AS c, count(*) AS n
  FROM e GROUP BY 1, 2
),
t AS (SELECT event_type, sum(c) AS tc, sum(n) AS tn FROM d GROUP BY 1)
SELECT d.event_type, CAST(d.dow AS INT) AS dow,
       CAST(d.n AS BIGINT) AS n_events,
       round(d.c / 100.0 / d.n, 6) + 0.0 AS dow_mean,
       round((d.c / 100.0 / d.n) / (t.tc / 100.0 / t.tn), 6) + 0.0
         AS seasonal_index
FROM d JOIN t USING (event_type)
ORDER BY 1, 2
"""


@register("w16_seasonal_index", oracle=_SEASONAL_INDEX_ORACLE)
def q_seasonal_index(spark, sf_dir):
    """Day-of-week seasonal index per event_type (0=Monday): the factor
    table the reference's week-spreading step would consume."""
    ev = load_table(spark, sf_dir, "events")
    return seasonal_index(ev, "event_type", "ts", "value").orderBy(
        "event_type", "dow"
    )


_SEASONAL_NAIVE_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
),
series AS (SELECT event_type, day, cents / 100.0 / n AS mean_value FROM daily),
paired AS (
  SELECT cur.event_type,
         CAST(round((round(cur.mean_value, 6) - round(prev.mean_value, 6))
                    * 1e6) AS BIGINT) AS e
  FROM series cur
  JOIN series prev
    ON prev.event_type = cur.event_type AND prev.day = cur.day - 7
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(abs(e)) // count(*) AS BIGINT) AS mae_micros,
       CAST(sum(e) // count(*) AS BIGINT) AS bias_micros
FROM paired GROUP BY 1 ORDER BY 1
"""


@register("w17_seasonal_naive_backtest", oracle=_SEASONAL_NAIVE_ORACLE)
def q_seasonal_naive_backtest(spark, sf_dir):
    """Seasonal-naive (t-7) backtest per event_type — the baseline the
    w14/w15 smoothers must beat to justify themselves."""
    ev = load_table(spark, sf_dir, "events")
    return seasonal_naive_backtest(ev, "event_type", "ts", "value").orderBy(
        "event_type"
    )


CUSUM_H_MULT = 4


def cusum_changepoints(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    h_mult: int = CUSUM_H_MULT,
) -> DataFrame:
    """Per-key CUSUM level-shift report (Page 1954) over the daily
    series: cusum_t = Σ_{s<=t} (daily_mean_s − key_mean), flagged where
    |cusum_t| exceeds ``h_mult`` × the key's mean absolute deviation —
    the demand-shift detector that tells a planner the w13/w15
    smoothing assumptions broke.

    Exactness: daily means quantize to integer micro-units per row
    (pure function of the exact cents rollup), the reference mean and
    MAD are integer div aggregates (both engines truncate toward
    zero), and the cumulative sum is integer — nothing engine-ordered
    crosses the hash.

    Plan: the shared daily rollup shuffle, then everything rides ONE
    key exchange — an unordered window pass for the reference mean, a
    second window pass (same partitioning) for the running sum and the
    MAD sum, and a final per-key partial agg. Key cardinality bounds
    every shuffle after the rollup."""
    from pyspark.sql import Window

    daily = _daily_mean_series(df, key, ts_col, value_col).select(
        key,
        "day",
        F.round(F.col("mean_value") * 1e6).cast("long").alias("__mv"),
    )
    w_all = Window.partitionBy(key)
    w_ord = (
        Window.partitionBy(key)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p1 = (
        daily.select(
            key,
            "day",
            "__mv",
            F.count(F.lit(1)).over(w_all).alias("__n"),
            F.sum("__mv").over(w_all).alias("__s"),
        )
        .withColumn("__ref", F.expr("__s div __n"))
        .withColumn("__dev", F.col("__mv") - F.col("__ref"))
    )
    p2 = p1.select(
        key,
        "day",
        "__n",
        "__ref",
        F.sum("__dev").over(w_ord).alias("__cusum"),
        F.sum(F.abs(F.col("__dev"))).over(w_all).alias("__madsum"),
    ).withColumn("__mad", F.expr("__madsum div __n"))
    flagged = F.abs(F.col("__cusum")) > F.lit(h_mult) * F.col("__mad")
    return p2.groupBy(key).agg(
        F.first("__n").alias("n_days"),
        F.first("__ref").alias("ref_micros"),
        F.first("__mad").alias("mad_micros"),
        F.max(F.abs(F.col("__cusum"))).alias("max_abs_cusum"),
        F.sum(F.when(flagged, 1).otherwise(0)).cast("long").alias(
            "n_changepoint_days"
        ),
        F.min(F.when(flagged, F.col("day"))).alias("first_changepoint_day"),
    )


def _cusum_oracle(h_mult: int = CUSUM_H_MULT) -> str:
    return f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
),
series AS (
  SELECT event_type, day,
         CAST(round(cents / 100.0 / n * 1e6) AS BIGINT) AS mv
  FROM daily
),
p1 AS (
  SELECT event_type, day, mv,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(mv) OVER (PARTITION BY event_type)
           // count(*) OVER (PARTITION BY event_type) AS ref
  FROM series
),
p2 AS (
  SELECT event_type, day, n, ref,
         sum(mv - ref) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cusum,
         sum(abs(mv - ref)) OVER (PARTITION BY event_type) // n AS mad
  FROM p1
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_days,
       CAST(max(ref) AS BIGINT) AS ref_micros,
       CAST(max(mad) AS BIGINT) AS mad_micros,
       CAST(max(abs(cusum)) AS BIGINT) AS max_abs_cusum,
       CAST(sum(CASE WHEN abs(cusum) > {h_mult} * mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_changepoint_days,
       min(CASE WHEN abs(cusum) > {h_mult} * mad THEN day END)
         AS first_changepoint_day
FROM p2 GROUP BY 1 ORDER BY 1
"""


@register("w18_cusum_changepoint", oracle=_cusum_oracle())
def q_cusum_changepoint(spark, sf_dir):
    """Per-event-type CUSUM level-shift report: integer running sums of
    daily-mean deviations, flagged past 4x the mean absolute deviation
    — the monitor that says the forecaster's level assumption broke."""
    ev = load_table(spark, sf_dir, "events")
    return cusum_changepoints(ev, "event_type", "ts", "value").orderBy(
        "event_type"
    )


def cusum_deseasonalized(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    h_mult: int = CUSUM_H_MULT,
) -> DataFrame:
    """w18's level-shift detector after removing weekly seasonality:
    deviations are taken against the key's PER-DAY-OF-WEEK mean (w16's
    factor table in integer micro-units) instead of one flat
    reference, so a strong weekday pattern no longer reads as a
    sequence of level shifts — the standard deseasonalize-then-monitor
    composition.

    Same exactness contract as w18 (integer micro devs, truncating
    integer div on both engines, int64 cumulative sums); plan adds one
    broadcast join against the |keys|x7 dow-mean table between the
    daily rollup and the single key-exchange window chain."""
    from pyspark.sql import Window

    daily = _daily_mean_series(df, key, ts_col, value_col).select(
        key,
        "day",
        F.weekday("day").alias("__dow"),
        F.round(F.col("mean_value") * 1e6).cast("long").alias("__mv"),
    )
    dow_means = daily.groupBy(key, "__dow").agg(
        F.expr("sum(__mv) div count(1)").alias("__dm")
    )
    dev = daily.join(F.broadcast(dow_means), [key, "__dow"]).select(
        key, "day", (F.col("__mv") - F.col("__dm")).alias("__dev")
    )
    w_all = Window.partitionBy(key)
    w_ord = (
        Window.partitionBy(key)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = (
        dev.select(
            key,
            "day",
            F.count(F.lit(1)).over(w_all).alias("__n"),
            F.sum("__dev").over(w_ord).alias("__cusum"),
            F.sum(F.abs(F.col("__dev"))).over(w_all).alias("__madsum"),
        )
        .withColumn("__mad", F.expr("__madsum div __n"))
    )
    flagged = F.abs(F.col("__cusum")) > F.lit(h_mult) * F.col("__mad")
    return p.groupBy(key).agg(
        F.first("__n").alias("n_days"),
        F.first("__mad").alias("mad_micros"),
        F.max(F.abs(F.col("__cusum"))).alias("max_abs_cusum"),
        F.sum(F.when(flagged, 1).otherwise(0)).cast("long").alias(
            "n_changepoint_days"
        ),
        F.min(F.when(flagged, F.col("day"))).alias("first_changepoint_day"),
    )


def _cusum_deseason_oracle(h_mult: int = CUSUM_H_MULT) -> str:
    return f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
),
series AS (
  SELECT event_type, day, isodow(day) - 1 AS dow,
         CAST(round(cents / 100.0 / n * 1e6) AS BIGINT) AS mv
  FROM daily
),
dmeans AS (
  SELECT event_type, dow, sum(mv) // count(*) AS dm
  FROM series GROUP BY 1, 2
),
dev AS (
  SELECT s.event_type, s.day, s.mv - d.dm AS dv
  FROM series s JOIN dmeans d USING (event_type, dow)
),
p1 AS (
  SELECT event_type, day,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(dv) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cusum,
         sum(abs(dv)) OVER (PARTITION BY event_type) AS madsum
  FROM dev
),
p2 AS (SELECT *, madsum // n AS mad FROM p1)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_days,
       CAST(max(mad) AS BIGINT) AS mad_micros,
       CAST(max(abs(cusum)) AS BIGINT) AS max_abs_cusum,
       CAST(sum(CASE WHEN abs(cusum) > {h_mult} * mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_changepoint_days,
       min(CASE WHEN abs(cusum) > {h_mult} * mad THEN day END)
         AS first_changepoint_day
FROM p2 GROUP BY 1 ORDER BY 1
"""


@register("w19_cusum_deseasonalized", oracle=_cusum_deseason_oracle())
def q_cusum_deseasonalized(spark, sf_dir):
    """Deseasonalized CUSUM per event_type: deviations against the
    per-day-of-week mean, so weekly rhythm stops masquerading as level
    shifts."""
    ev = load_table(spark, sf_dir, "events")
    return cusum_deseasonalized(ev, "event_type", "ts", "value").orderBy(
        "event_type"
    )
