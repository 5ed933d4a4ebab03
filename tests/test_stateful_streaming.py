"""Cross-batch stateful URL dedup: duplicates in later micro-batches
must be suppressed by the per-bucket state; idle buckets must expire
their state when a timeout is configured; within a batch the earliest
warc_ts capture wins."""

import os

import pandas as pd

from contessa_spark.sources.webgen import generate
from contessa_spark.streaming.stateful import make_dedup_fn, streaming_url_dedup
from contessa_spark.streaming.quality_stream import read_web_stream


class _FakeState:
    """Minimal GroupState stand-in for driving the handler directly."""

    def __init__(self, seen=None, timed_out=False):
        self._seen = seen
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._seen is not None

    @property
    def get(self):
        return (self._seen,)

    def update(self, v):
        self._seen = v[0]

    def remove(self):
        self.removed = True
        self._seen = None

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def _batch(rows):
    return pd.DataFrame(
        rows, columns=["url", "warc_ts", "text", "lang", "bucket", "_fp"]
    )


def test_idle_bucket_state_expires():
    """A timed-out invocation must evict the fingerprint set and emit
    nothing; a later sighting of an old url is then re-emitted (the
    documented TTL trade-off)."""
    fn = make_dedup_fn(timeout_minutes=5)
    state = _FakeState(seen=[1, 2, 3], timed_out=True)
    out = list(fn((0,), iter([]), state))
    assert out == []
    assert state.removed and not state.exists

    # next batch after eviction: url 1 re-emits and the timeout re-arms
    state2 = _FakeState()
    b = _batch([("u1", pd.Timestamp("2024-01-01"), "t", "en", 0, 1)])
    out2 = list(fn((0,), iter([b]), state2))
    assert len(out2) == 1 and len(out2[0]) == 1
    assert state2.timeout_ms == 5 * 60_000
    assert state2.get[0] == [1]


def test_earliest_capture_wins_within_batch():
    """Same url twice in one micro-batch, later capture first in
    arrival order → the EARLIER warc_ts row must be the one emitted
    (matching the batch dedup_urls semantics)."""
    fn = make_dedup_fn()
    state = _FakeState()
    b = _batch(
        [
            ("u1", pd.Timestamp("2024-02-01"), "late", "en", 0, 1),
            ("u1", pd.Timestamp("2024-01-01"), "early", "en", 0, 1),
            ("u2", pd.Timestamp("2024-03-01"), "only", "en", 0, 2),
        ]
    )
    out = pd.concat(list(fn((0,), iter([b]), state)))
    assert len(out) == 2
    assert out[out["url"] == "u1"]["text"].iloc[0] == "early"
    assert state.timeout_ms is None  # no timeout configured → not armed


def test_streaming_url_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    first = generate(spark, 150, seed=21)
    first.write.parquet(src)

    deduped = streaming_url_dedup(read_web_stream(spark, src), n_buckets=8)
    q = (
        deduped.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n1 = spark.read.parquet(sink).count()
    assert n1 == 150

    # second wave: the first 100 docs again (pure duplicates) plus the
    # genuinely-new tail of a 200-doc regeneration
    generate(spark, 100, seed=21).write.mode("append").parquet(src)
    all200 = generate(spark, 200, seed=21)
    fresh = all200.join(first.select("url"), "url", "left_anti")
    fresh.write.mode("append").parquet(src)
    n_fresh = fresh.count()

    q = (
        streaming_url_dedup(read_web_stream(spark, src), n_buckets=8)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(sink)
    assert out.count() == 150 + n_fresh
    # every url exactly once
    assert out.select("url").distinct().count() == out.count()


def test_earliest_capture_wins_across_arrow_chunks():
    """applyInPandasWithState delivers one group as MULTIPLE chunks; the
    min-warc_ts row may sit in a later chunk and must still win
    (ADVICE r2: per-chunk sorting broke the documented semantics)."""
    fn = make_dedup_fn(None)
    state = _FakeState()
    ts = pd.Timestamp
    chunk1 = _batch([("u", ts("2024-01-02"), "later", "en", 0, 7)])
    chunk2 = _batch(
        [
            ("u", ts("2024-01-01"), "earliest", "en", 0, 7),
            ("v", ts("2024-01-03"), "other", "en", 0, 8),
        ]
    )
    out = pd.concat(list(fn((0,), iter([chunk1, chunk2]), state)))
    byurl = {r.url: r.text for r in out.itertuples()}
    assert byurl == {"u": "earliest", "v": "other"}
    assert sorted(state.get[0]) == [7, 8]
