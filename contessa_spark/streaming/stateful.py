"""Custom stateful streaming operator: cross-batch URL deduplication.

The canonical streaming ingest problem for web corpora: the same url
re-appears across crawl snapshots/micro-batches; downstream must see
each url once — the EARLIEST capture (min ``warc_ts``) within a
micro-batch, the first-arriving batch across batches (matching the
batch pipeline's ``dedup_urls`` stage as closely as append-mode
streaming allows). Spark's ``dropDuplicates`` keeps unbounded state
with no grouping control; this implements the operator explicitly with
``applyInPandasWithState`` (the arbitrary-stateful-processing API),
keyed by url hash bucket:

* state per bucket = the set of url fingerprints already emitted
  (stored as a binary-packed array — compact, no per-url state rows);
* each micro-batch is sorted by ``warc_ts`` and emits only rows whose
  fingerprint is new, then merges the fingerprints into state;
* ``timeout_minutes`` arms a processing-time timeout per bucket:
  buckets idle longer than that have their state evicted, bounding
  state on endless streams (urls may then re-emit — the documented
  trade-off of any TTL'd dedup).

Bucketing by ``pmod(xxhash64(url), n_buckets)`` keeps state shards
balanced regardless of hot domains — same salting story as the batch
pipeline.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "url string, warc_ts timestamp, text string, lang string, bucket int"
)
STATE_SCHEMA = T.StructType(
    [T.StructField("seen", T.ArrayType(T.LongType()), True)]
)


def make_dedup_fn(timeout_minutes: Optional[int] = None):
    """Build the per-group state handler (closure carries the timeout
    so the worker can re-arm it after every batch)."""

    def _dedup_fn(
        key: Tuple[Any, ...],
        batches: Iterable,
        state: GroupState,
    ) -> Iterator:
        import pandas as pd

        if state.hasTimedOut:
            # idle-bucket eviction: drop the fingerprint set entirely
            state.remove()
            return

        seen = set(state.get[0]) if state.exists else set()
        # materialize the whole group's micro-batch FIRST:
        # applyInPandasWithState delivers a group as MULTIPLE Arrow
        # chunks (~10k rows each), and sorting each chunk independently
        # would make earliest-capture-wins hold only per chunk — a url
        # whose min-warc_ts row lands in a later chunk would emit a
        # later capture. State is already O(group), so one concat does
        # not change the memory shape.
        pdfs = list(batches)
        if pdfs:
            pdf = pd.concat(pdfs) if len(pdfs) > 1 else pdfs[0]
            # earliest capture wins: scan the batch in warc_ts order so
            # a url repeated within one micro-batch emits its oldest row
            # (stable sort keeps arrival order for equal timestamps)
            pdf = pdf.sort_values("warc_ts", kind="mergesort")
            fresh_mask = []
            for fp in pdf["_fp"]:
                fp = int(fp)
                if fp in seen:
                    fresh_mask.append(False)
                else:
                    seen.add(fp)
                    fresh_mask.append(True)
            kept = pdf[pd.Series(fresh_mask, index=pdf.index)]
        else:
            kept = None
        state.update((list(seen),))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60_000)
        if kept is not None and len(kept):
            yield kept[["url", "warc_ts", "text", "lang", "bucket"]]

    return _dedup_fn


def streaming_url_dedup(
    stream_df: DataFrame,
    n_buckets: int = 64,
    timeout_minutes: Optional[int] = None,
) -> DataFrame:
    """First-seen URL dedup across micro-batches (append mode — each
    url is emitted exactly once, on first sight; within a micro-batch
    the earliest ``warc_ts`` row wins). With ``timeout_minutes`` set,
    idle buckets expire their state (bounded state on long streams)."""
    with_key = stream_df.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    ).withColumn("_fp", F.xxhash64("url"))
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return with_key.groupBy("bucket").applyInPandasWithState(
        make_dedup_fn(timeout_minutes),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
