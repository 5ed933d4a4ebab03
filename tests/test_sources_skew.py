"""WARC source round-trip + salted aggregation equivalence."""

import os
from datetime import datetime

from pyspark.sql import functions as F

from contessa_spark.operators.skew import domain_col, salted_agg, salted_counts
from contessa_spark.sources.warc import read_warc, write_warc
from contessa_spark.sources.webgen import gen_row, generate


def test_warc_round_trip(spark, tmp_path):
    """generator pages → WARC bytes → read_warc → same urls/html."""
    pages = [gen_row(i, seed=5) for i in range(40)]
    warc_dir = tmp_path / "warc"
    warc_dir.mkdir()
    # two files to exercise file-granular parallelism
    write_warc(
        [(p["url"], p["warc_ts"], p["html"]) for p in pages[:20]],
        str(warc_dir / "part1.warc"),
    )
    write_warc(
        [(p["url"], p["warc_ts"], p["html"]) for p in pages[20:]],
        str(warc_dir / "part2.warc"),
    )
    df = read_warc(spark, str(warc_dir))
    rows = {r["url"]: r for r in df.collect()}
    assert len(rows) == 40
    for p in pages:
        r = rows[p["url"]]
        assert bytes(r["html"]) == p["html"]
        assert r["warc_ts"] == p["warc_ts"]
        # the stub extractor strips the <html><body> wrapper back off;
        # docs whose text contains literal '<' (symbol soup) are mangled
        # by any tag-stripper — only tag-free docs round-trip text
        if "<" not in p["text"]:
            assert r["text"] == p["text"]


def test_html_extract_text_semantics():
    """The real extractor: skip-subtrees, entities, block newlines,
    whitespace normalization, malformed-input resilience."""
    from contessa_spark.sources.warc import extract_text

    html = b"""<html><head><title>Ignore me</title>
    <style>body { color: red }</style></head>
    <body>
      <script>var x = "never show";</script>
      <h1>Header&nbsp;One</h1>
      <p>First   paragraph with &amp; entity and &#x27;quote&#x27;.</p>
      <div>Second <b>bold inline</b> block.</div>
      <ul><li>item one</li><li>item two</li></ul>
      <br/>tail text
    </body></html>"""
    out = extract_text(html)
    lines = out.split("\n")
    assert "never show" not in out and "color: red" not in out
    assert "Ignore me" not in out
    # &nbsp; decoded, then normalized to a plain space (NBSP is in the
    # whitespace contract), own block line
    assert "Header One" in lines
    assert "First paragraph with & entity and 'quote'." in lines
    assert "Second bold inline block." in lines  # inline tag = no break
    assert "item one" in lines and "item two" in lines
    assert lines.index("item one") < lines.index("item two")
    assert "tail text" in lines

    # malformed html never raises, unclosed skip tags don't eat the doc
    assert extract_text(b"<p>ok<div><script>bad") == "ok"
    assert extract_text(b"") == ""
    assert extract_text(b"plain no tags at all") == "plain no tags at all"
    # deterministic (byte-identity invariant)
    assert extract_text(html) == out


def test_warc_skips_non_response_records(spark, tmp_path):
    p = tmp_path / "w.warc"
    body = b"HTTP/1.1 200 OK\r\n\r\nhello"
    rec = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: "
        + str(len(body)).encode()
        + b"\r\n\r\n"
        + body
        + b"\r\n\r\n"
    )
    from contessa_spark.sources.warc import warc_record

    data = rec + warc_record("https://x.org/a", datetime(2025, 1, 1), b"<p>hi</p>")
    p.write_bytes(data)
    df = read_warc(spark, str(p))
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["url"] == "https://x.org/a"
    assert rows[0]["text"] == "hi"


def test_salted_counts_match_plain_groupby(spark):
    web = generate(spark, 2000, seed=42).withColumn("domain", domain_col())
    plain = {
        r["domain"]: r["n"]
        for r in web.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {
        r["domain"]: r["n_rows"]
        for r in salted_counts(web, ["domain"], "url", n_salt=8).collect()
    }
    assert salted == plain
    # hot-domain skew exists in the generator (Zipf-ish)
    assert max(plain.values()) > 5 * (sum(plain.values()) / len(plain))


def test_salted_agg_sums(spark):
    web = generate(spark, 1000, seed=42).withColumn("domain", domain_col())
    web = web.withColumn("textlen", F.length("text").cast("double"))
    plain = {
        (r["domain"]): (r["n"], r["s"])
        for r in web.groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("textlen"), 4).alias("s"))
        .collect()
    }
    salted = {
        r["domain"]: (r["n_rows"], r["sum_textlen"])
        for r in salted_agg(web, ["domain"], "url", ["textlen"], n_salt=8).collect()
    }
    assert salted == plain
