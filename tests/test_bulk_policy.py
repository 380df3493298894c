"""BulkFlushPolicy / bulk writer unit tests (no live Elasticsearch needed —
reference policy: AmazonElasticsearchSink.java:22-24,53-56)."""

from __future__ import annotations

import os

import pytest

from flink_clickstream_processor_msk_spark.streaming.sinks import (
    BulkFlushPolicy,
    bulk_chunks,
    dedup_epochs,
    make_bulk_writer,
    send_with_backoff,
)


def test_flush_on_action_count():
    p = BulkFlushPolicy(max_actions=3, max_bytes=1 << 30, max_interval_s=1e9)
    chunks = list(bulk_chunks([f"d{i}" for i in range(7)], p))
    assert [len(c) for c in chunks] == [3, 3, 1]


def test_flush_on_byte_size():
    p = BulkFlushPolicy(max_actions=10**6, max_bytes=10, max_interval_s=1e9)
    chunks = list(bulk_chunks(["aaaaa"] * 5, p))  # 5 bytes each -> 2 per chunk
    assert [len(c) for c in chunks] == [2, 2, 1]


def test_flush_on_interval():
    p = BulkFlushPolicy(max_actions=10**6, max_bytes=1 << 30, max_interval_s=1.0)
    t = iter([0.0, 0.5, 1.5, 1.6, 1.7, 1.8, 1.9])  # clock readings
    chunks = list(bulk_chunks(["a", "b", "c"], p, clock=lambda: next(t)))
    assert [len(c) for c in chunks] == [2, 1]  # interval trips after 2nd doc


def test_backoff_retries_then_succeeds():
    calls, sleeps = [], []

    def flaky(chunk):
        calls.append(chunk)
        if len(calls) < 3:
            raise ConnectionError("transient")

    p = BulkFlushPolicy(max_retries=3, backoff_base_s=0.1)
    send_with_backoff(flaky, ["x"], p, sleep=sleeps.append)
    assert len(calls) == 3
    assert sleeps == [0.1, 0.2]  # exponential


def test_backoff_exhausted_raises():
    p = BulkFlushPolicy(max_retries=2, backoff_base_s=0.0)

    def always_fails(chunk):
        raise ConnectionError("down")

    with pytest.raises(ConnectionError):
        send_with_backoff(always_fails, ["x"], p, sleep=lambda s: None)


def test_dedup_epochs_skips_redelivered_batches(tmp_path):
    """Spark replays a failed micro-batch with the same epoch_id — the
    wrapper must deliver each epoch exactly once."""
    delivered = []
    writer = dedup_epochs(lambda df, e: delivered.append((df, e)), str(tmp_path / "m"))
    writer("batch-a", 0)
    writer("batch-a-replayed", 0)  # redelivery of epoch 0: skipped
    writer("batch-b", 1)
    assert delivered == [("batch-a", 0), ("batch-b", 1)]


def test_bulk_writer_delivers_all_rows(spark, tmp_path):
    """End-to-end: foreachBatch-style delivery on executors — every row
    arrives exactly once as a JSON doc, chunked per policy."""
    out = str(tmp_path)

    def send(chunk):
        import json as _json
        import uuid

        path = os.path.join(out, f"{uuid.uuid4().hex}.jsonl")
        with open(path, "w") as f:
            for doc in chunk:
                f.write(doc + "\n")
        for doc in chunk:
            _json.loads(doc)  # every doc is valid JSON

    df = spark.range(20).selectExpr("id", "id * 2 as v")
    writer = make_bulk_writer(send, BulkFlushPolicy(max_actions=4))
    writer(df, epoch_id=0)

    import json

    got = []
    for name in os.listdir(out):
        with open(os.path.join(out, name)) as f:
            got += [json.loads(line) for line in f]
    assert sorted(r["id"] for r in got) == list(range(20))
    assert all(r["v"] == r["id"] * 2 for r in got)


def test_http_bulk_sender_posts_ndjson_and_retries(tmp_path):
    """The stdlib /_bulk transport: chunks arrive as one NDJSON body with
    a trailing newline at {endpoint}/_bulk, a 5xx raises (so
    send_with_backoff retries and succeeds on recovery), and an
    "errors": true bulk response raises too."""
    import http.server
    import json
    import threading

    from flink_clickstream_processor_msk_spark.streaming.sinks import (
        BulkFlushPolicy,
        http_bulk_sender,
        send_with_backoff,
    )

    bodies: list[bytes] = []
    fail_next: list[str] = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            if fail_next:
                mode = fail_next.pop(0)
                if mode == "500":
                    self.send_response(500)
                    self.end_headers()
                    return
                if mode == "errors":
                    payload = json.dumps({"errors": True, "items": []}).encode()
                    self.send_response(200)
                    self.end_headers()
                    self.wfile.write(payload)
                    return
            bodies.append(body)
            assert self.path == "/_bulk"
            assert self.headers["Content-Type"] == "application/x-ndjson"
            self.send_response(200)
            self.end_headers()
            self.wfile.write(json.dumps({"errors": False, "items": []}).encode())

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        send = http_bulk_sender(f"http://127.0.0.1:{srv.server_port}")
        chunk = ['{"index":{"_index":"t"}}\n{"a":1}', '{"index":{"_index":"t"}}\n{"a":2}']
        send(chunk)
        assert bodies == [("\n".join(chunk) + "\n").encode()]

        # transient 500 -> backoff retry succeeds
        fail_next.append("500")
        send_with_backoff(
            send, chunk, BulkFlushPolicy(backoff_base_s=0.01), sleep=lambda s: None
        )
        assert len(bodies) == 2

        # a 200 whose bulk response reports item errors still raises
        fail_next.append("errors")
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="errors"):
            send(chunk)
    finally:
        srv.shutdown()


def test_bulk_writer_es_framing_is_valid_bulk_body(spark, tmp_path):
    """With es_index set, every delivered document is the /_bulk line
    PAIR: an action line ({"index":{"_index","_type"[,"_id"]}}) followed
    by the row's source JSON — so a newline-joined chunk is a valid bulk
    request body. Deterministic _id from id_cols; every row arrives
    exactly once."""
    import json

    out = str(tmp_path)

    def send(chunk):
        import uuid

        with open(os.path.join(out, f"{uuid.uuid4().hex}.ndjson"), "w") as f:
            f.write("\n".join(chunk) + "\n")

    df = spark.range(10).selectExpr("id", "id * 3 as v")
    writer = make_bulk_writer(
        send,
        BulkFlushPolicy(max_actions=3),
        es_index="things",
        es_id_cols=["id", "v"],
    )
    writer(df, epoch_id=0)

    pairs = []
    for name in os.listdir(out):
        with open(os.path.join(out, name)) as f:
            lines = [ln for ln in f.read().splitlines() if ln]
        # each chunk entry was action\nsource; the file joined entries by
        # \n, so the flat line stream alternates action/source
        assert len(lines) % 2 == 0
        for a, s in zip(lines[0::2], lines[1::2]):
            pairs.append((json.loads(a), json.loads(s)))
    assert sorted(p[1]["id"] for p in pairs) == list(range(10))
    for a, s in pairs:
        assert a["index"]["_index"] == "things"
        assert a["index"]["_type"] == "things"
        assert a["index"]["_id"] == f"{s['id']}:{s['v']}"


def test_http_bulk_sender_tolerates_non_object_json_bodies():
    """r13 review: a 200 with a JSON array/scalar body raised
    AttributeError past the ValueError catch, so send_with_backoff
    re-POSTed an already-delivered chunk. Any non-object JSON body is a
    transport-level OK."""
    import http.server
    import threading

    from flink_clickstream_processor_msk_spark.streaming.sinks import (
        http_bulk_sender,
    )

    n_posts = [0]
    bodies = [b"[]", b'"ok"', b"3", b"null"]

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            self.rfile.read(int(self.headers["Content-Length"]))
            self.send_response(200)
            self.end_headers()
            self.wfile.write(bodies[n_posts[0] % len(bodies)])
            n_posts[0] += 1

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        send = http_bulk_sender(f"http://127.0.0.1:{srv.server_port}")
        for _ in bodies:
            send(['{"index":{"_index":"t"}}\n{"a":1}'])  # must not raise
        assert n_posts[0] == len(bodies)  # one POST each — no retry storm
    finally:
        srv.shutdown()


def test_bulk_chunks_accounts_utf8_bytes():
    """r13 review: the 1 MB reference cap is a wire-size limit — CJK text
    is 3 bytes/char, so character accounting undercounted 3x."""
    from flink_clickstream_processor_msk_spark.streaming.sinks import (
        BulkFlushPolicy,
        bulk_chunks,
    )

    doc = "漢" * 100            # 100 chars, 300 UTF-8 bytes
    policy = BulkFlushPolicy(
        max_actions=10_000, max_interval_s=3600.0, max_bytes=600
    )
    chunks = list(bulk_chunks([doc] * 6, policy, clock=lambda: 0.0))
    # 2 docs = 600 bytes trips the cap; char accounting would pack 6
    assert [len(c) for c in chunks] == [2, 2, 2]


def test_es_bulk_records_refuses_null_id_components(spark):
    """r13 review: concat_ws silently skips null components, colliding
    _ids for rows that differ only in a null id column — refuse loudly
    instead (non-null bytes unchanged, the oracle-pinned encoding)."""
    import pytest

    from flink_clickstream_processor_msk_spark.streaming.sinks import (
        es_bulk_records,
    )

    df = spark.createDataFrame(
        [("a", 1), ("b", None)], "k string, w long"
    )
    ok = es_bulk_records(
        df.filter("w IS NOT NULL"), "idx", id_cols=["k", "w"]
    ).collect()
    assert '"_id":"a:1"' in ok[0]["action"]
    with pytest.raises(Exception, match="id column 'w' is NULL"):
        es_bulk_records(df, "idx", id_cols=["k", "w"]).collect()
