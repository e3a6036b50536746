"""K7: notification sink — the engine-side contract for the reference's
SMTP alerts (``packages/myNotifyClass.py``: subject/body email on
pipeline completion or failure).

Transport (SMTP/webhook/pager) is a driver-side adapter outside the
engine; what belongs IN the engine is producing the notification
*records* from query results — e.g. failing QC verdicts — and appending
them durably. A monitoring job (or the adapter) tails the sink. This
keeps the alert path distributed and replayable: notifications are data,
not side effects buried in executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def notification_rows(
    df: DataFrame,
    condition: "F.Column",
    subject: str,
    body_cols: list[str],
    severity: str = "ERROR",
) -> DataFrame:
    """Rows of ``df`` matching ``condition`` formatted as notification
    records: ``(ts, severity, subject, body)``. ``body`` concatenates
    ``body_cols`` as ``k=v`` pairs — the engine-side analog of the
    reference's email body assembly."""
    pairs = []
    for c in body_cols:
        # coalesce: a NULL value would null the whole k=v pair and
        # concat_ws would then drop the field name from the body — and
        # anomalous rows (what alerts are FOR) are exactly where NULLs
        # live. Render them as "null" instead.
        pairs.append(
            F.concat(
                F.lit(f"{c}="),
                F.coalesce(F.col(c).cast("string"), F.lit("null")),
            )
        )
    return df.filter(condition).select(
        F.current_timestamp().alias("ts"),
        F.lit(severity).alias("severity"),
        F.lit(subject).alias("subject"),
        F.concat_ws(" ", *pairs).alias("body"),
        # one sink schema for batch and streaming appends; the
        # foreachBatch hook fills this with the micro-batch id
        F.lit(None).cast("long").alias("batch_id"),
    )


def append_notifications(notifications: DataFrame, sink_dir: str) -> int:
    """Append notification records to a durable parquet sink; returns the
    number appended. Use inside ``foreachBatch`` for streaming QC."""
    # materialize once: count-then-write on the lazy plan would scan the
    # source twice per micro-batch (and stamp two current_timestamps)
    notifications = notifications.localCheckpoint(eager=True)
    n = notifications.count()
    if n:
        notifications.write.mode("append").parquet(sink_dir)
    return n


def foreach_batch_notify(
    condition: "F.Column",
    subject: str,
    body_cols: list[str],
    sink_dir: str,
    severity: str = "ERROR",
):
    """``foreachBatch`` hook: emit notifications for matching rows of
    each micro-batch (the streaming analog of the reference's
    end-of-pipeline email)."""

    def hook(batch_df: DataFrame, batch_id: int) -> None:
        notes = notification_rows(
            batch_df, condition, subject, body_cols, severity
        ).withColumn("batch_id", F.lit(batch_id).cast("long"))
        append_notifications(notes, sink_dir)

    return hook


def send_notifications_smtp(
    records: DataFrame,
    host: str,
    port: int,
    sender: str,
    to: list[str],
    cc: list[str] | None = None,
    subject: str | None = None,
    max_records: int = 1000,
) -> int:
    """K7 transport: the reference's SMTP send
    (``packages/myNotifyClass.py:40-99`` — MIME subject/from/to/cc over
    plain ``smtplib.SMTP``), as a bounded driver-side adapter over the
    engine's notification records.

    The engine half stays distributed (records are data in the durable
    sink); this adapter collects one ALERT-sized batch — alerts are
    report-sized by construction, and the explicit ``max_records`` cap
    raises rather than silently truncating (the ``write_excel``
    bounded-collect contract) — and sends ONE summary message: subject
    from the first record (or override), one ``[severity] subject:
    body`` line per record. Returns the number of records sent; 0 rows
    sends nothing."""
    import smtplib
    from email.mime.multipart import MIMEMultipart
    from email.mime.text import MIMEText

    # stable order BEFORE limit/collect: which rows survive the cap, the
    # body line order, and the subject (rows[0]) must not depend on
    # partition arrival order
    rows = (
        records.orderBy("severity", "subject", "body")
        .limit(max_records + 1)
        .collect()
    )
    if len(rows) > max_records:
        raise ValueError(
            f"notification batch exceeds max_records={max_records}; "
            "an unbounded alert storm should page from the sink, not "
            "one email"
        )
    if not rows:
        return 0
    cc = cc or []
    msg = MIMEMultipart()
    msg["Subject"] = subject or (
        f"{rows[0]['severity']}: {rows[0]['subject']} ({len(rows)} records)"
    )
    msg["From"] = sender
    msg["To"] = ", ".join(to)
    if cc:
        msg["Cc"] = ", ".join(cc)
    body = "\n".join(
        f"[{r['severity']}] {r['subject']}: {r['body']}" for r in rows
    )
    msg.attach(MIMEText(body, "plain"))
    with smtplib.SMTP(host, port) as server:
        server.sendmail(sender, list(to) + list(cc), msg.as_string())
    return len(rows)
