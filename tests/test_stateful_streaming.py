"""Cross-batch stateful URL dedup: duplicates in later micro-batches
must be suppressed by the per-bucket state."""

import os

from contessa_spark.sources.webgen import generate
from contessa_spark.streaming.stateful import streaming_url_dedup
from contessa_spark.streaming.quality_stream import read_web_stream


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
