"""Live-transport test: a producer thread speaks the reference protocol
(one JSON payload object per line over TCP, Dataset/stream.py:150-201)
and the engine consumes it with the socket source — proving the wire
contract, not just the file-source replay."""

import json
import socket
import threading
import time

from machine_learning_with_spark_streaming_spark.streaming.source import (
    parse_feature_lines,
    read_feature_stream_socket,
)

N_FEATURES = 3
N_ROWS = 8


def _payload(start: int, n: int) -> str:
    return json.dumps(
        {
            str(i): {
                **{f"feature{j}": float(i + j) for j in range(N_FEATURES)},
                "label": float(i % 2),
            }
            for i in range(start, start + n)
        }
    )


class _Producer(threading.Thread):
    """Binds an ephemeral port, accepts one client (the Spark source),
    sends two payload batches, then holds the socket open."""

    def __init__(self):
        super().__init__(daemon=True)
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.port = self.sock.getsockname()[1]
        self.sock.listen(1)
        self.stop = threading.Event()

    def run(self):
        self.sock.settimeout(60)
        try:
            conn, _ = self.sock.accept()
        except socket.timeout:
            return
        with conn:
            conn.sendall((_payload(0, N_ROWS // 2) + "\n").encode())
            conn.sendall((_payload(N_ROWS // 2, N_ROWS // 2) + "\n").encode())
            self.stop.wait(timeout=90)
        self.sock.close()


def test_socket_source_end_to_end(spark):
    producer = _Producer()
    producer.start()
    stream = read_feature_stream_socket(
        spark, N_FEATURES, host="127.0.0.1", port=producer.port
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("socket_rows")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        got = 0
        while time.time() < deadline:
            got = spark.sql("select count(*) c from socket_rows").first().c
            if got >= N_ROWS:
                break
            time.sleep(0.5)
        assert got == N_ROWS, f"expected {N_ROWS} streamed rows, got {got}"
        rows = {
            r.row_idx: r
            for r in spark.sql("select * from socket_rows").collect()
        }
        assert rows[0].feature0 == 0.0 and rows[0].label == 0.0
        assert rows[N_ROWS - 1].feature2 == float(N_ROWS - 1 + 2)
    finally:
        producer.stop.set()
        q.stop()


def test_socket_parse_matches_batch_parse(spark):
    # the socket pipeline reuses parse_feature_lines verbatim; check the
    # payload text parses identically through the batch path
    line = _payload(0, N_ROWS)
    df = spark.createDataFrame([(line,)], "value string")
    out = parse_feature_lines(df, N_FEATURES).orderBy("row_idx").collect()
    assert len(out) == N_ROWS
    assert [r.row_idx for r in out] == list(range(N_ROWS))
