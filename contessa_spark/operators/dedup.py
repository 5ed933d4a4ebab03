"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

All deterministic (hash-based, no RNG), all shuffle-conscious:

* exact: one hash-aggregate on a fingerprint column — the canonical
  web-dedup first pass (URL- or content-keyed);
* n-gram Jaccard: exact pairwise similarity via a shingle inverted
  index (explode → self-join on shingle → group by pair) — never a
  cross join;
* MinHash+LSH: ONE fused pandas-UDF pass computes band keys + the
  shingle hash set, candidate pairs come from capped band-bucket
  groups, exact-Jaccard verification joins the persisted hash sets —
  the scale path (Broder 1997; Leskovec/Rajaraman/Ullman ch.3);
* SimHash (Charikar 2002; Manku et al. WWW'07): 64-bit signature via a
  vectorized pandas UDF, near-dup = Hamming distance ≤ k emitted from
  capped rotated-band-key groups;
* embedding cosine: LSH-bucketed or brute pair join over `array<float>`.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cap_groups(
    groups: DataFrame, list_col: str, max_df: Optional[int], observation=None
) -> DataFrame:
    """Document-frequency cap for pair-emitting group passes.

    Pair emission from a posting list / band bucket is O(|group|²): one
    shingle or band key shared by 10⁶ docs would emit 5·10¹¹ pairs from
    a single group — the only quadratic blowup in these plans at web
    scale. Groups larger than ``max_df`` are DROPPED before emission
    (standard practice: a shingle common to millions of documents
    carries no near-duplicate signal, and a band bucket that hot is an
    exact-dup cluster that ``exact_dedup`` should have removed first).

    Pass a ``pyspark.sql.Observation`` to get, after the first action,
    ``dropped_groups`` and ``dropped_postings`` — what was dropped is
    never silent.
    """
    if max_df is None:
        return groups
    if observation is not None:
        groups = groups.observe(
            observation,
            F.count(F.when(F.size(list_col) > max_df, 1)).alias("dropped_groups"),
            F.coalesce(
                F.sum(F.when(F.size(list_col) > max_df, F.size(list_col))),
                F.lit(0),
            ).alias("dropped_postings"),
        )
    return groups.where(F.size(list_col) <= max_df)


# ---------------------------------------------------------------- exact

def fingerprint_col(text_col: str = "text") -> Column:
    """Normalized-content fingerprint: md5 of lowercased,
    whitespace-collapsed text. JVM-side."""
    c = F.col(text_col)
    norm = F.regexp_replace(F.lower(F.trim(c)), r"(?U)\s+", " ")
    return F.md5(norm.cast("binary"))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per distinct normalized text.

    One shuffle on the fingerprint (hash partitioning); AQE coalesces
    and splits skewed groups. At 100 TB: fingerprint is 16 bytes/row —
    the shuffle moves fingerprints + ids only if you project first,
    which this does (join back for payload).
    """
    fp = df.select(F.col(id_col), fingerprint_col(text_col).alias("fp"))
    keep = fp.groupBy("fp").agg(F.min(id_col).alias(id_col)).drop("fp")
    return df.join(keep, id_col, "left_semi")


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(fp, dup_count, keep_id) for groups with >1 member."""
    return (
        df.select(fingerprint_col(text_col).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("dup_count"), F.min(id_col).alias("keep_id"))
        .where(F.col("dup_count") > 1)
    )


def dedup_doc_lines(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Intra-document exact line dedup (the C4 §2.2 'discard all but
    one of any three-sentence span' family / Gopher repetition hygiene,
    in its exact-line form): keep the FIRST occurrence of every exact
    line, preserving document order.

    Pure per-row JVM — split → array_distinct (first-occurrence order)
    → rejoin; no shuffle, whole-stage codegen. The cheap first pass
    that runs before any corpus-level dedup: boilerplate nav/footer
    lines repeated inside a page vanish here for free.
    Output: (id, clean_text, n_lines, n_dupe_lines)."""
    lines = F.split(F.col(text_col), "\n")
    uniq = F.array_distinct(lines)
    return df.select(
        F.col(id_col),
        F.concat_ws("\n", uniq).alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        (F.size(lines) - F.size(uniq)).cast("long").alias("n_dupe_lines"),
    )


def corpus_line_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CROSS-document exact line dedup (the RefinedWeb/CCNet-style
    corpus pass; C4 §2.2's three-sentence-span rule in its exact-line
    form): every distinct line survives exactly ONCE in the whole
    corpus — at its globally first occurrence, ordered by
    (doc_id, line_idx) — and every later occurrence is dropped; docs
    are rebuilt preserving their internal line order.

    Plan, shaped for the hot-line hazard: a boilerplate line ("", nav
    text) occurs in ~every doc, so a window partitioned by line would
    funnel 10¹² rows into one partition. Instead the global first
    occurrence is ``min(struct(doc_id, idx))`` per line — a hash
    aggregate with MAP-SIDE partial combine, so hot lines reduce to one
    row per partition before the shuffle — followed by a join back on
    the line (one row per distinct line on the build side; AQE
    skew-join splits the probe side if needed) and a rebuild groupBy on
    the doc id. Three shuffles total, none unbounded.

    Output: (id, clean_text, n_lines, n_kept).
    """
    return _corpus_span_dedup(
        df, F.split(F.col(text_col), "\n"), "\n", id_col, "n_lines"
    )


#: sentence boundary sentinel (RS control char — never occurs in text);
#: boundaries are MARKED then split because RE2 (the DuckDB oracle
#: engine) has no lookbehind, so a shared ``(?<=[.!?])\s+`` split
#: pattern is not engine-portable
_SENT_SEP = "\u001e"


def sentence_split_col(text_col: str = "text") -> Column:
    r"""array<string> of sentences: terminator [.!?] + whitespace ends
    a sentence (trailing punctuation kept; the final fragment counts
    even unterminated). Same (?U)\s whitespace contract as the
    tokenizers;
    deliberately simple — deterministic and SQL-reproducible, not a
    learned splitter."""
    # strip any pre-existing RS control chars first: the sentinel must
    # be unambiguous even against adversarial input (mirrored in the
    # SQL oracle)
    cleaned = F.replace(F.col(text_col), F.lit(_SENT_SEP), F.lit(""))
    marked = F.regexp_replace(cleaned, r"(?U)([.!?])(\s+)", "$1" + _SENT_SEP)
    # text ending in terminator+whitespace ('Hello. ') leaves a trailing
    # EMPTY span after the split, inflating n_sentences and letting ''
    # join cross-document dedup; RE2 (the oracle engine) has no
    # lookahead to anchor the marker, so filter empties instead
    # (mirrored in the SQL oracle's list_filter)
    return F.filter(F.split(marked, _SENT_SEP), lambda x: x != "")


def corpus_sentence_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CROSS-document exact SENTENCE dedup — ``corpus_line_dedup`` at
    sentence granularity (closer to C4 §2.2's actual sentence-span
    unit than lines): every distinct sentence survives once at its
    global first occurrence; docs rebuild with single spaces. Same
    hot-span-safe min(struct) plan — see ``corpus_line_dedup``.
    Output: (id, clean_text, n_sentences, n_kept)."""
    return _corpus_span_dedup(
        df, sentence_split_col(text_col), " ", id_col, "n_sentences"
    )


def _corpus_span_dedup(
    df: DataFrame,
    spans_col: Column,
    join_sep: str,
    id_col: str,
    count_alias: str,
) -> DataFrame:
    # The first-occurrence aggregate and its join back run on a 128-bit
    # span FINGERPRINT (two independent xxhash64 seeds — 16 bytes), not
    # the span text: at web scale the distinct-span table is
    # corpus-sized text, and hashing the group/build keys keeps both
    # the map-side combine state and the build-side shuffle narrow. The
    # raw span travels only on the probe side, where the rebuild needs
    # it anyway. 128 bits ⇒ collision odds ~n²/2¹²⁹ (≪1 even at 10¹²
    # distinct spans).
    spans = df.select(
        F.col(id_col), F.posexplode(spans_col).alias("idx", "span")
    ).withColumns(
        {
            "_h1": F.xxhash64(F.col("span")),
            "_h2": F.xxhash64(F.col("span"), F.lit(0x5EED)),
        }
    )
    firsts = spans.groupBy("_h1", "_h2").agg(
        F.min(F.struct(F.col(id_col), F.col("idx"))).alias("_first")
    )
    kept = (
        spans.join(firsts, ["_h1", "_h2"])
        .where(
            (F.col(f"_first.{id_col}") == F.col(id_col))
            & (F.col("_first.idx") == F.col("idx"))
        )
        .select(id_col, "idx", "span")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            join_sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "span"))),
                lambda s: s["span"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    base = df.select(
        F.col(id_col), F.size(spans_col).cast("long").alias(count_alias)
    )
    return base.join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        count_alias,
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
    )


# ------------------------------------------------------------- shingles

def shingle_col(text_col: str = "text", k: int = 3) -> Column:
    """Distinct word k-gram shingles as array<string>. JVM-side:
    split → sequence → transform(slice → concat_ws).

    NOTE: higher-order array lambdas are INTERPRETED (no codegen) —
    measured ~1.8ms/doc on 1.4k-word docs. This form is kept as the
    SQL-comparable reference; the hot paths use ``shingles_udf``
    (identical output, ~40× faster)."""
    words = F.filter(F.split(F.lower(F.col(text_col)), r"(?U)\s+"), lambda x: x != F.lit(""))
    n = F.size(words)
    shingles = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(words, i, k)),
    )
    # guard: sequence(1, x<1) would count DOWN in Spark
    return F.when(n >= k, F.array_distinct(shingles)).otherwise(
        F.array().cast("array<string>")
    )


def py_shingles(text: str, k: int = 3) -> List[str]:
    """Pure core: distinct word k-gram shingles, first-occurrence order
    (matches array_distinct of the JVM form)."""
    words = text.lower().split()
    if len(words) < k:
        return []
    seen = {}
    for i in range(len(words) - k + 1):
        s = " ".join(words[i : i + k])
        if s not in seen:
            seen[s] = None
    return list(seen.keys())


def shingles_udf(k: int = 3):
    """pandas UDF: text → array<string> of distinct word k-grams."""
    import pandas as pd
    from pyspark.sql import types as T

    def _sh(texts):
        return pd.Series(
            [py_shingles(t if isinstance(t, str) else "", k) for t in texts]
        )

    _sh.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return F.pandas_udf(_sh, T.ArrayType(T.StringType()))


def _make_fnv64_memo():
    """Per-worker memoized FNV-64 string hash: shingles/words repeat
    heavily across documents (Zipf), and the per-byte loop is the
    hottest UDF line — a dict hit replaces ~30 interpreter steps.
    Bounded so a pathological corpus can't grow worker memory."""
    _memo: dict = {}

    def _fnv64(s: str) -> int:
        h = _memo.get(s)
        if h is not None:
            return h
        h = 0xCBF29CE484222325
        for byte in s.encode("utf-8", "ignore"):
            h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        if len(_memo) < 4_000_000:
            _memo[s] = h
        return h

    return _fnv64


def _batch_shingle_hashes(texts, k, _fnv64):
    """Batch core: FNV-64 hashes of every doc's shingles (first-
    occurrence order), as ONE flat uint64 array plus per-doc lengths.

    The batch's shingle strings are ``pd.factorize``-d so the per-byte
    FNV loop runs once per UNIQUE shingle (Zipf: far fewer than
    occurrences) and cross-batch repeats hit the per-worker memo; the
    codes array then broadcasts the hashes back at numpy speed. The
    old form paid an ``np.fromiter`` generator call per occurrence."""
    import itertools

    import numpy as np
    import pandas as pd

    per_doc = [py_shingles(t if isinstance(t, str) else "", k) for t in texts]
    lens = np.fromiter(map(len, per_doc), dtype=np.int64, count=len(per_doc))
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint64), lens
    flat = np.empty(total, dtype=object)
    flat[:] = list(itertools.chain.from_iterable(per_doc))
    codes, uniq = pd.factorize(flat)
    uh = np.fromiter(
        (_fnv64(u) for u in uniq.tolist()), dtype=np.uint64, count=len(uniq)
    )
    return uh[codes], lens


def _segment_unique(flat, lens):
    """Per-doc sorted-unique over a flat (uint64) batch array: one
    lexsort + run-boundary mask instead of one ``np.unique`` call per
    doc. Returns a list of int64 arrays (unsigned sort order then
    int64 view — exactly ``np.unique(raw).view(int64)``)."""
    import numpy as np

    n_docs = len(lens)
    if len(flat) == 0:
        empty = np.empty(0, dtype=np.int64)
        return [empty] * n_docs
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    order = np.lexsort((flat, doc_of))
    fs = flat[order]
    ds = doc_of[order]
    keep = np.empty(len(fs), dtype=bool)
    keep[0] = True
    np.logical_or(ds[1:] != ds[:-1], fs[1:] != fs[:-1], out=keep[1:])
    vals = fs[keep].view(np.int64)
    counts = np.bincount(ds[keep], minlength=n_docs)
    return np.split(vals, np.cumsum(counts)[:-1])


def hashed_shingles_udf(k: int = 3):
    """pandas UDF: text → struct(hs: array<long> distinct FNV-64
    shingle hashes, n: int = len(hs)). The inverted-index shuffle then
    carries 8-byte longs instead of ~20-byte gram strings — ~2× fewer
    shuffle bytes on the posting lists, which dominate the
    exact-Jaccard plan at scale. Jaccard over the hash sets equals
    Jaccard over the string sets unless two distinct shingles of the
    SAME doc pair FNV-collide (~2⁻⁶⁴ per pair of distinct shingles —
    negligible).

    ``n`` rides in the struct instead of a downstream ``size(_sh)``
    projection: collapsing ``size`` into the UDF's projection made the
    optimizer materialize a SECOND ``ArrowEvalPython`` below the
    spread exchange (guide §4.4's duplicated-UDF trap) — the capped
    path then ran the whole shingle pass twice, once single-core.
    Struct first, fields second (the established in-repo pattern)
    keeps it one eval."""
    import pandas as pd
    from pyspark.sql import types as T

    _fnv64 = _make_fnv64_memo()

    def _hs(texts):
        flat, lens = _batch_shingle_hashes(texts, k, _fnv64)
        hs = _segment_unique(flat, lens)
        return pd.DataFrame({"hs": hs, "n": [len(a) for a in hs]})

    _hs.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}
    return F.pandas_udf(
        _hs,
        T.StructType(
            [
                T.StructField("hs", T.ArrayType(T.LongType())),
                T.StructField("n", T.IntegerType()),
            ]
        ),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
    max_df: Optional[int] = None,
    observation=None,
    block_docs: int = 4096,
    n_docs: Optional[int] = None,
) -> DataFrame:
    """Exact Jaccard over word-k-gram shingle sets for every pair
    sharing ≥1 shingle. ``n_docs`` (uncapped path only): corpus row
    count if already known — skips the block-count job.

    Two physical strategies, same output:

    * **uncapped** (``max_df=None``): block-pair local intersection
      counting. Docs are hashed into B blocks (B scale-adaptive from
      the corpus size, ≤ ``block_docs`` docs per block); each doc's
      hashed shingle set is replicated to its B block-pairs and every
      unordered doc pair is counted in exactly ONE block-pair task with
      vectorized numpy (sort → run-length pair emission → unique-sum).
      Sub-threshold pairs never leave Python: there is NO per-pair
      shuffle and no JVM hash aggregate over the O(Σ df²) coincidence
      rows — on a fixed-vocabulary corpus that aggregate dominates the
      old inverted-index plan and grows quadratically with corpus size,
      while this plan shuffles only B× the (hashed, ~40 B/doc)
      signature table. The per-pair *counting* work is the same
      O(Σ df²) either way — inherent to exact all-pairs — but runs at
      numpy memory bandwidth instead of one shuffled row per
      coincidence.
    * **capped** (``max_df`` set — recommended at scale, e.g. 500):
      the shingle inverted index (explode → group by shingle → capped
      pair emission), because the cap semantics are defined on posting
      lists: lists longer than ``max_df`` are DROPPED before pair
      emission — see ``_cap_groups``. With a cap, pairs whose overlap
      includes a dropped hot shingle undercount ``common`` (recall-only
      loss; the reported jaccard of surviving pairs is a lower bound).

    Both paths carry FNV-64 shingle HASHES (``hashed_shingles_udf``) —
    value-identical output up to ~2⁻⁶⁴ within-pair collisions — and
    both compute the final jaccard/round in the same Spark expressions.
    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    """
    if max_df is None:
        return _ngram_jaccard_pairs_blocked(
            df, id_col, text_col, k, threshold, block_docs, n_docs
        )
    import pandas as pd

    # asNondeterministic (guide §4.4): deterministic python UDF
    # projections get PUSHED THROUGH the caller's round-robin spread
    # exchange and then re-extracted above it — two ArrowEvalPython
    # nodes, with the below-exchange one running on the unspread
    # (often single-split) scan. The UDF is pure; the marking only
    # pins its evaluation above the exchange (verified: 2 nodes → 1).
    sh = df.select(
        F.col(id_col).alias("_id"),
        hashed_shingles_udf(k).asNondeterministic()(F.col(text_col)).alias("_t"),
    ).select(
        "_id", F.col("_t.hs").alias("_sh"), F.col("_t.n").alias("_n")
    )
    inv = sh.select("_id", "_n", F.explode("_sh").alias("_s"))
    # pairs generated per shingle GROUP (collect the posting list, emit
    # id pairs) — single pass over the inverted index, no self-join, so
    # the (UDF-computed) shingles are evaluated exactly once
    groups = (
        inv.groupBy("_s")
        .agg(F.collect_list(F.struct("_id", "_n")).alias("_docs"))
        .where(F.size("_docs") > 1)
        .select("_docs")
    )
    groups = _cap_groups(groups, "_docs", max_df, observation)

    def emit_pairs(batches):
        import numpy as np

        # vectorized upper-triangle pair emission: the nested python
        # loop is O(g²) *interpreter* steps (2M list-appends for one
        # g=2000 group); numpy triu indexing + ONE concat per Arrow
        # batch measured 11× faster on the sf0.1 shingle distribution.
        # triu index pairs are cached per group size (sizes repeat).
        #
        # Pairs are PARTIALLY COUNTED per Arrow batch before leaving
        # Python (lexsort + run-length boundaries — all vectorized): a
        # near-dup pair at threshold 0.1 shares hundreds of shingles,
        # so its raw emission repeats across the batch's groups, and
        # every repeat would otherwise cross the Arrow boundary and
        # feed the JVM hash aggregate as its own row. The downstream
        # groupBy sums the partial counts — identical `common`, ~an
        # order of magnitude fewer Python→JVM rows on near-dup-dense
        # corpora.
        triu = {}
        for pdf in batches:
            ca, cb, cna, cnb = [], [], [], []
            for docs in pdf["_docs"]:
                g = len(docs)
                if g < 2:
                    continue
                ids = np.fromiter((d["_id"] for d in docs), dtype=np.int64, count=g)
                ns = np.fromiter((d["_n"] for d in docs), dtype=np.int64, count=g)
                order = np.argsort(ids, kind="stable")
                ids, ns = ids[order], ns[order]
                t = triu.get(g)
                if t is None:
                    t = np.triu_indices(g, 1)
                    triu[g] = t
                xi, yi = t
                ca.append(ids[xi])
                cb.append(ids[yi])
                cna.append(ns[xi])
                cnb.append(ns[yi])
            if ca:
                ia = np.concatenate(ca)
                ib = np.concatenate(cb)
                na = np.concatenate(cna)
                nb = np.concatenate(cnb)
                order = np.lexsort((ib, ia))
                ia, ib, na, nb = ia[order], ib[order], na[order], nb[order]
                new = np.empty(len(ia), dtype=bool)
                new[0] = True
                np.logical_or(
                    ia[1:] != ia[:-1], ib[1:] != ib[:-1], out=new[1:]
                )
                idx = np.flatnonzero(new)
                cnt = np.diff(np.append(idx, len(ia)))
                yield pd.DataFrame(
                    {
                        "id_a": ia[idx],
                        "id_b": ib[idx],
                        "na": na[idx],
                        "nb": nb[idx],
                        "cnt": cnt.astype(np.int64),
                    }
                )
            else:
                yield pd.DataFrame(
                    {"id_a": [], "id_b": [], "na": [], "nb": [], "cnt": []}
                ).astype("int64")

    pairs = (
        groups.mapInPandas(
            emit_pairs, schema="id_a long, id_b long, na int, nb int, cnt long"
        )
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.sum("cnt").alias("common"))
    )
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        pairs.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def _murmur3_int(x: int, seed: int = 42) -> int:
    """Spark's ``Murmur3Hash`` of one IntegerType value (Murmur3_x86_32
    ``hashInt`` with Spark's default seed 42), as a signed int32 —
    lets the driver predict ``pmod(hash(col), n)`` partition placement
    for int columns. Checked against ``F.hash`` in tests."""
    M = 0xFFFFFFFF

    def rotl(v: int, r: int) -> int:
        return ((v << r) | (v >> (32 - r))) & M

    k1 = (x * 0xCC9E2D51) & M
    k1 = rotl(k1, 15)
    k1 = (k1 * 0x1B873593) & M
    h1 = seed & M
    h1 ^= k1
    h1 = rotl(h1, 13)
    h1 = (h1 * 5 + 0xE6546B64) & M
    h1 ^= 4  # fmix: len in bytes
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & M
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & M
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def _partition_target_values(n: int) -> list:
    """For each partition p in 0..n-1, a small int v with
    ``pmod(murmur3(v), n) == p`` — i.e. a column value Spark's hash
    partitioner provably routes to partition p. Brute-force scan;
    expected n·H(n) ≈ n·ln n murmur evaluations (microseconds for the
    ≤4096 group counts this is used at)."""
    out = [None] * n
    found = 0
    v = 0
    while found < n:
        p = _murmur3_int(v) % n
        if out[p] is None:
            out[p] = v
            found += 1
        v += 1
    return out


def _make_block_pair_emitter(threshold: float, chunk_pairs: int = 1 << 21):
    """applyInPandas kernel for one block-pair: count |A∩B| for every
    doc pair sharing ≥1 shingle hash, threshold locally, emit only
    passing pairs as (id_a, id_b, common, na, nb).

    All vectorized: concat the block's hash arrays → one stable argsort
    → equal-hash runs → pair (x, y) for every in-run position pair
    x < y (generated arithmetically from run offsets, ``chunk_pairs``
    positions at a time so a degenerate clone-cluster block can't
    materialize O(m²·s) pairs at once) → unique-sum on the (u·m+v)
    pair key. Off-diagonal block-pairs keep only cross-side pairs
    (same-side pairs belong to that block's own diagonal task).

    The threshold prefilter uses the same float64 division Spark
    applies downstream, so the pass/fail set is bit-identical; the
    emitted integers let Spark recompute jaccard with the exact
    expression (and rounding) the inverted-index path uses.
    """

    def emit(pdf):
        import numpy as np
        import pandas as pd

        def _empty():
            return pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype="int64"),
                    "id_b": pd.Series([], dtype="int64"),
                    "common": pd.Series([], dtype="int64"),
                    "na": pd.Series([], dtype="int32"),
                    "nb": pd.Series([], dtype="int32"),
                }
            )

        m = len(pdf)
        if m < 2:
            return _empty()
        diag = bool(pdf["_bi"].iat[0] == pdf["_bj"].iat[0])
        ids = pdf["_id"].to_numpy(dtype=np.int64)
        ns = pdf["_n"].to_numpy(dtype=np.int64)
        side = pdf["_side"].to_numpy(dtype=np.int8)
        hs = [np.asarray(a, dtype=np.int64) for a in pdf["_sh"]]
        lens = np.fromiter((len(a) for a in hs), dtype=np.int64, count=m)
        if int(lens.sum()) == 0:
            return _empty()
        hcat = np.concatenate(hs)
        ia, ib, c, na, nb = _count_block_pair(
            ids, ns, side, hcat, lens, diag, threshold, chunk_pairs
        )
        if len(ia) == 0:
            return _empty()
        return pd.DataFrame(
            {
                "id_a": ia,
                "id_b": ib,
                "common": c,
                "na": na,
                "nb": nb,
            }
        )

    return emit


def _count_block_pair(ids, ns, side, hcat, lens, diag, threshold, chunk_pairs):
    """Numeric core of the block-pair counter (see
    ``_make_block_pair_emitter``): takes the block-pair's rows as flat
    numpy arrays, returns (id_a, id_b, common, na, nb) for pairs at or
    above ``threshold``. Chunk results are accumulated in a pending
    list and merged GEOMETRICALLY (only once pending reaches the
    aggregate's size) — the old merge re-sorted the full aggregate
    after every chunk, which made per-task cost superlinear in block
    size and dominated large-block runs."""
    import numpy as np

    m = len(ids)
    empty = (
        np.empty(0, np.int64),
        np.empty(0, np.int64),
        np.empty(0, np.int64),
        np.empty(0, np.int32),
        np.empty(0, np.int32),
    )
    # int32 positions/keys where m² < 2³¹ (always at the default
    # block_docs): halves the transient chunk arrays, which set the
    # worker's peak RSS
    dt = np.int32 if m <= 46340 else np.int64
    dcat = np.repeat(np.arange(m, dtype=dt), lens)
    if diag:
        order = np.argsort(hcat, kind="stable")
    else:
        # within each run: side-0 elements first, then side-1 —
        # lets L below emit ONLY cross-side pairs (no same-side
        # waste; same-side pairs belong to the diagonal tasks)
        order = np.lexsort((side[dcat], hcat))
    hsorted = hcat[order]
    dsorted = dcat[order]  # ascending row idx within each run
    N = len(hsorted)
    newrun = np.empty(N, dtype=bool)
    newrun[0] = True
    np.not_equal(hsorted[1:], hsorted[:-1], out=newrun[1:])
    # start position of each element's run; L = how many earlier
    # in-run elements each position pairs with
    run_start = np.flatnonzero(newrun)
    start_pos = run_start[np.cumsum(newrun) - 1]
    if diag:
        L = np.arange(N, dtype=np.int64) - start_pos
    else:
        # side-1 positions pair with every side-0 element of their
        # run (all earlier by the lexsort); side-0 positions emit 0
        s1 = side[dsorted]
        cz = np.concatenate(([0], np.cumsum(s1 == 0, dtype=np.int64)))
        run_len = np.diff(np.append(run_start, N))
        n0_per_run = cz[run_start + run_len] - cz[run_start]
        L = np.where(s1 == 1, n0_per_run[np.cumsum(newrun) - 1], 0)
    csum = np.concatenate(([0], np.cumsum(L)))
    if int(csum[-1]) == 0:
        return empty

    def _merge(arrs_k, arrs_c):
        allk = np.concatenate(arrs_k)
        allc = np.concatenate(arrs_c)
        o = np.argsort(allk, kind="stable")
        allk, allc = allk[o], allc[o]
        nr = np.empty(len(allk), dtype=bool)
        nr[0] = True
        np.not_equal(allk[1:], allk[:-1], out=nr[1:])
        idx = np.flatnonzero(nr)
        return allk[idx], np.add.reduceat(allc, idx)

    agg_k = agg_c = None
    pend_k, pend_c, pend_n = [], [], 0
    pos = 0
    while pos < N:
        end = int(np.searchsorted(csum, csum[pos] + chunk_pairs, "right")) - 1
        end = max(end, pos + 1)
        Ls = L[pos:end]
        tot = int(csum[end] - csum[pos])
        pos_prev, pos = pos, end
        if tot == 0:
            continue
        # pair every position p in [pos_prev, end) with the L[p]
        # earlier positions of its run
        y = np.repeat(np.arange(pos_prev, end, dtype=np.int32), Ls)
        base = (csum[pos_prev:end] - csum[pos_prev]).astype(np.int32)
        x = (
            np.arange(tot, dtype=np.int32)
            - np.repeat(base, Ls)
            + np.repeat(start_pos[pos_prev:end].astype(np.int32), Ls)
        )
        key = dsorted[x] * m + dsorted[y]  # u < v by in-run order
        k, c = np.unique(key, return_counts=True)
        pend_k.append(k)
        pend_c.append(c)
        pend_n += len(k)
        if pend_n >= max(len(agg_k) if agg_k is not None else 0, chunk_pairs):
            if agg_k is not None:
                pend_k.append(agg_k)
                pend_c.append(agg_c)
            agg_k, agg_c = _merge(pend_k, pend_c)
            pend_k, pend_c, pend_n = [], [], 0
    if pend_n:
        if agg_k is not None:
            pend_k.append(agg_k)
            pend_c.append(agg_c)
        agg_k, agg_c = _merge(pend_k, pend_c)
    u = agg_k // m
    v = agg_k % m
    c = agg_c
    na = ns[u]
    nb = ns[v]
    keep = c / (na + nb - c) >= threshold
    u, v, c, na, nb = u[keep], v[keep], c[keep], na[keep], nb[keep]
    if len(u) == 0:
        return empty
    ia = ids[u]
    ib = ids[v]
    return (
        np.minimum(ia, ib),
        np.maximum(ia, ib),
        c.astype(np.int64),
        na.astype(np.int32),
        nb.astype(np.int32),
    )


def _make_block_pair_arrow_kernel(threshold: float, chunk_pairs: int = 1 << 21):
    """mapInArrow kernel for a partition holding one or more complete
    block-pair groups (explicit LPT placement — see
    ``_ngram_jaccard_pairs_blocked``). Reads the Arrow list column's
    contiguous values+offsets buffers directly, so the per-row ndarray
    allocation, ``pd.concat`` and per-row ``np.asarray`` the pandas
    path pays (hundreds of thousands of tiny objects per task at
    replication factor B) never happen; per group the kernel runs the
    same ``_count_block_pair`` core on one gathered slice."""

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        ids_l, ns_l, side_l, bi_l, bj_l, flat_l, lens_l = (
            [], [], [], [], [], [], [],
        )
        for b in batches:
            if b.num_rows == 0:
                continue
            cols = {n: b.column(i) for i, n in enumerate(b.schema.names)}
            ids_l.append(cols["_id"].to_numpy(zero_copy_only=False))
            ns_l.append(
                cols["_n"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            side_l.append(
                cols["_side"].to_numpy(zero_copy_only=False).astype(np.int8)
            )
            bi_l.append(cols["_bi"].to_numpy(zero_copy_only=False))
            bj_l.append(cols["_bj"].to_numpy(zero_copy_only=False))
            sh = cols["_sh"]
            offs = sh.offsets.to_numpy(zero_copy_only=False)
            vals = sh.values.to_numpy(zero_copy_only=False)
            lens_l.append(np.diff(offs))
            flat_l.append(vals[offs[0] : offs[-1]])
        if not ids_l:
            return
        ids = np.concatenate(ids_l)
        ns = np.concatenate(ns_l)
        side = np.concatenate(side_l)
        bi = np.concatenate(bi_l).astype(np.int64)
        bj = np.concatenate(bj_l).astype(np.int64)
        lens = np.concatenate(lens_l)
        flat = np.concatenate(flat_l) if flat_l else np.empty(0, np.int64)
        bounds = np.concatenate(([0], np.cumsum(lens)))
        gkey = bi * (1 << 31) + bj
        out = []
        for g in np.unique(gkey):
            rows = np.flatnonzero(gkey == g)
            if len(rows) < 2:
                continue
            Lr = lens[rows]
            tot = int(Lr.sum())
            if tot == 0:
                continue
            shift = np.concatenate(([0], np.cumsum(Lr[:-1])))
            gi = np.repeat(bounds[rows] - shift, Lr) + np.arange(tot)
            res = _count_block_pair(
                ids[rows],
                ns[rows],
                side[rows],
                flat[gi],
                Lr,
                bool((g >> 31) == (g & ((1 << 31) - 1))),
                threshold,
                chunk_pairs,
            )
            if len(res[0]):
                out.append(res)
        if out:
            ia = np.concatenate([p[0] for p in out])
            ib = np.concatenate([p[1] for p in out])
            c = np.concatenate([p[2] for p in out])
            na = np.concatenate([p[3] for p in out])
            nb = np.concatenate([p[4] for p in out])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ia, type=pa.int64()),
                    pa.array(ib, type=pa.int64()),
                    pa.array(c, type=pa.int64()),
                    pa.array(na, type=pa.int32()),
                    pa.array(nb, type=pa.int32()),
                ],
                names=["id_a", "id_b", "common", "na", "nb"],
            )

    return kernel


def _ngram_jaccard_pairs_blocked(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    threshold: float,
    block_docs: int,
    n_docs: Optional[int] = None,
) -> DataFrame:
    """Uncapped exact-Jaccard pairs via block-pair local counting (see
    ``ngram_jaccard_pairs``). B is derived from the corpus size (one
    cheap column-pruned count — or pass ``n_docs`` when the caller
    already knows it, e.g. from a parquet footer or snapshot stats,
    to skip that job) so blocks stay ≤ ``block_docs`` docs, with a
    parallelism floor of ~√(2·defaultParallelism) blocks (≈ 2× cores
    worth of block-pair tasks) — scale-adaptive, never a constant
    tuned to one cluster size."""
    import math

    sc = df.sparkSession.sparkContext
    if n_docs is None:
        n_docs = df.select(id_col).count()
    b_par = math.ceil(math.sqrt(2 * sc.defaultParallelism))
    B = min(
        max(math.ceil(n_docs / block_docs), b_par),
        max(1, n_docs // 64 + 1),
    )
    sigs = df.select(
        F.col(id_col).alias("_id"),
        hashed_shingles_udf(k).asNondeterministic()(F.col(text_col)).alias("_t"),
    ).select(
        "_id", F.col("_t.hs").alias("_sh"), F.col("_t.n").alias("_n")
    )
    # each doc participates in exactly B block-pairs: (blk, j) as the
    # lower side for j ≥ blk, (j, blk) as the upper side for j < blk
    blk = F.pmod(F.xxhash64(F.col("_id")), F.lit(B)).cast("int")
    targets = F.transform(
        F.sequence(F.lit(0), F.lit(B - 1)),
        lambda j: F.struct(
            F.least(F.col("_blk"), j).alias("_bi"),
            F.greatest(F.col("_blk"), j).alias("_bj"),
            F.when(F.col("_blk") <= j, F.lit(0)).otherwise(F.lit(1)).alias("_side"),
        ),
    )
    rep = (
        sigs.withColumn("_blk", blk)
        .select("_id", "_sh", "_n", F.explode(targets).alias("_p"))
        .select("_id", "_sh", "_n", "_p.*")
    )
    schema = "id_a long, id_b long, common long, na int, nb int"
    nG = B * (B + 1) // 2
    n_bins = max(sc.defaultParallelism, 1)
    if n_bins < nG <= 4096:
        # Pack the nG block-pair groups into EXACTLY defaultParallelism
        # reduce tasks, balanced by predicted pair work (off-diagonal
        # blocks hold 2m docs and ~2× a diagonal's pairs), and place
        # each bin on its own partition via a value Spark's
        # murmur3-mod-n partitioner provably routes there. Plain
        # groupBy hashing stacked 2-5 groups per task (measured 5×
        # min/max skew at sf1.0, worsened by AQE's byte-based
        # coalescing — partition bytes say nothing about O(m²) pair
        # work), and one-group-per-task lost to wave quantization
        # (nG tasks over P cores = ragged ceil(nG/P) waves). LPT
        # packing + explicit placement gives one full wave of
        # near-equal tasks; an explicit numPartitions AQE won't
        # coalesce. Beyond 4096 groups (or nG ≤ cores) the law of
        # large numbers (resp. the group count) makes hashing fine.
        weights = [
            (bi * B - (bi * (bi - 1)) // 2 + (bj - bi), 1 if bi == bj else 2)
            for bi in range(B)
            for bj in range(bi, B)
        ]
        order = sorted(weights, key=lambda tw: -tw[1])
        assign = [0] * nG
        import heapq

        heap = [(0, b) for b in range(n_bins)]
        heapq.heapify(heap)
        for t, w in order:
            load, b = heapq.heappop(heap)
            assign[t] = b
            heapq.heappush(heap, (load + w, b))
        tvals = _partition_target_values(n_bins)
        route = [tvals[assign[t]] for t in range(nG)]
        t_idx = F.expr(
            f"_bi * {B} - (_bi * (_bi - 1)) DIV 2 + (_bj - _bi)"
        ).cast("int")
        part = (
            rep.withColumn("_pt", F.element_at(F.lit(route), t_idx + 1))
            .repartition(n_bins, "_pt")
            .select("_id", "_sh", "_n", "_bi", "_bj", "_side")
        )
        cand = part.mapInArrow(
            _make_block_pair_arrow_kernel(threshold), schema=schema
        )
    else:
        cand = rep.groupBy("_bi", "_bj").applyInPandas(
            _make_block_pair_emitter(threshold), schema=schema
        )
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        cand.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# --------------------------------------------------------- MinHash+LSH

def minhash_signature(
    shingles: Column, n_hashes: int = 64
) -> Column:
    """array<long> of n minhashes — min over xxhash64(shingle, seed_j).
    Pure JVM; deterministic across partitionings. Reference form — the
    hot path uses ``band_keys_udf`` (numpy affine minhash, same
    collision statistics, ~40× faster than n interpreted transforms)."""
    sigs = [
        F.array_min(
            F.transform(shingles, lambda s: F.xxhash64(s, F.lit(j)))
        )
        for j in range(n_hashes)
    ]
    return F.array(*sigs)


_MERSENNE = (1 << 61) - 1


def _affine_params(n_hashes: int, seed: int = 1234567):
    """Deterministic (a_j, b_j) pairs for affine minhash permutations."""
    import numpy as np

    def splitmix(x):
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        return z ^ (z >> 31)

    a = np.array([splitmix(seed + 2 * j) % _MERSENNE or 1 for j in range(n_hashes)], dtype=np.uint64)
    b = np.array([splitmix(seed + 2 * j + 1) % _MERSENNE for j in range(n_hashes)], dtype=np.uint64)
    return a, b


def _batch_band_keys(flat, lens, n_hashes, bands, A, B):
    """Batch minhash → band keys over a flat shingle-hash array.

    For each affine permutation j the whole batch is transformed in one
    vectorized pass and segment-minimized with ``minimum.reduceat``
    (per-doc boundaries), then the per-band FNV fold runs as uint64
    vector ops across ALL docs at once — the old per-doc form paid a
    (n_hashes × n_shingles) allocation per doc plus a Python int-boxing
    loop per band key, which dominated the signature UDF.

    Bit-identical to the old form: uint64 multiply/add wrap mod 2^64
    exactly like the old numpy broadcast; the final signed key
    ``(acc ^ band) − 2^63`` is computed as the int64 view of
    ``(acc ^ band) ^ 2^63`` (adding/subtracting 2^63 mod 2^64 only
    flips the top bit). Returns an (n_nonempty, bands) int64 matrix for
    the docs with ≥1 shingle, plus the nonzero mask."""
    import numpy as np

    r = n_hashes // bands
    nz = lens > 0
    if not nz.any():
        return np.empty((0, bands), dtype=np.int64), nz
    bounds = np.concatenate(([0], np.cumsum(lens)))
    starts = bounds[:-1][nz]
    base = flat % np.uint64(_MERSENNE)
    n_nz = int(nz.sum())
    sig = np.empty((n_hashes, n_nz), dtype=np.uint64)
    for j in range(n_hashes):
        y = (A[j] * base + B[j]) % np.uint64(_MERSENNE)
        sig[j] = np.minimum.reduceat(y, starts)
    basis = np.uint64(1469598103934665603)
    prime = np.uint64(0x100000001B3)
    keys = np.empty((bands, n_nz), dtype=np.uint64)
    for i in range(bands):
        acc = np.full(n_nz, basis, dtype=np.uint64)
        for row in range(i * r, (i + 1) * r):
            acc = (acc ^ sig[row]) * prime
        # band index folded in so bands never collide across i
        keys[i] = acc ^ np.uint64(i)
    signed = (keys ^ np.uint64(1 << 63)).view(np.int64)
    return np.ascontiguousarray(signed.T), nz


def band_keys_udf(k: int = 3, n_hashes: int = 64, bands: int = 16):
    """pandas UDF: text → array<long> of LSH band keys.

    Per batch: shingles → FNV-64 base hash per shingle (factorized) →
    affine family ``(a_j·h + b_j) mod (2^61−1)`` → segment-min per doc
    (the minhash signature) → vectorized FNV fold per band. All numpy;
    deterministic; value-identical to the per-doc reference form.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    A, B = _affine_params(n_hashes)
    _fnv64 = _make_fnv64_memo()

    def _keys(texts):
        flat, lens = _batch_shingle_hashes(texts, k, _fnv64)
        km, nz = _batch_band_keys(flat, lens, n_hashes, bands, A, B)
        empty = np.empty(0, dtype=np.int64)
        out = [empty] * len(lens)
        for idx, d in enumerate(np.flatnonzero(nz)):
            out[d] = km[idx]
        return pd.Series(out)

    _keys.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return F.pandas_udf(_keys, T.ArrayType(T.LongType()))


def lsh_signature_udf(k: int = 3, n_hashes: int = 64, bands: int = 16):
    """pandas UDF: text → struct(keys: array<long> LSH band keys,
    hs: binary — the distinct shingle hashes packed as native int64
    bytes).

    ONE fused pass computes both what the candidate stage needs (band
    keys — same derivation as ``band_keys_udf``) and what the verify
    stage needs (the distinct FNV-64 shingle hash set): text crosses
    the JVM↔Python boundary once and shingling/hashing runs once,
    instead of a second shingle UDF over candidate docs. Exact Jaccard
    over the hash sets equals Jaccard over the string shingle sets
    unless two distinct shingles FNV-collide (~2⁻⁶⁴ per pair of
    distinct shingles — negligible even at 10¹² docs per doc pair,
    since only within-pair collisions matter).

    ``hs`` is BINARY rather than array<long>: the signature table is
    persisted and scanned by three consumers (band explode + both
    verify-join probes), and a deserialized cached array column costs
    an object per element where the packed form is one byte buffer per
    doc — cheaper to cache, scan, shuffle and Arrow-transfer. The
    verify kernel reads it back with ``np.frombuffer`` (same machine
    byte order on both sides of the boundary)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    A, B = _affine_params(n_hashes)
    _fnv64 = _make_fnv64_memo()

    def _sig(texts):
        flat, lens = _batch_shingle_hashes(texts, k, _fnv64)
        km, nz = _batch_band_keys(flat, lens, n_hashes, bands, A, B)
        empty = np.empty(0, dtype=np.int64)
        keys_out = [empty] * len(lens)
        for idx, d in enumerate(np.flatnonzero(nz)):
            keys_out[d] = km[idx]
        hs_out = [a.tobytes() for a in _segment_unique(flat, lens)]
        return pd.DataFrame({"keys": keys_out, "hs": hs_out})

    _sig.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}
    return F.pandas_udf(
        _sig,
        T.StructType(
            [
                T.StructField("keys", T.ArrayType(T.LongType())),
                T.StructField("hs", T.BinaryType()),
            ]
        ),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    max_df: Optional[int] = None,
    observation=None,
    verify_semi_join: bool = False,
    cleanup: Optional[list] = None,
) -> DataFrame:
    """MinHash → band → bucket-group → exact-Jaccard verify.

    Collision probability for a pair with Jaccard s is
    1 − (1 − s^r)^b with r = n_hashes/bands rows per band; at
    (64, 16) the S-curve crosses ~0.77 — tuned for threshold 0.8.

    Plan (one UDF pass, three shuffles):
    1. ``lsh_signature_udf`` computes band keys AND the distinct
       shingle-hash set per doc in one fused pass; the narrow
       (id, keys, hs) projection is persisted — it feeds both the
       candidate and verify stages.
    2. Candidates: explode band keys → group by key → capped
       vectorized pair emission (never a self-join).
    3. Verify: join the candidate pairs back to the persisted hash
       sets (AQE broadcasts the small pair side) and compute exact
       |A∩B|/|A∪B| with a vectorized sorted-array intersection —
       no re-shingling, no posting-list shuffle of candidate docs.

    ``max_df`` (recommended at scale) drops band buckets larger than
    that before candidate emission — see ``_cap_groups``. A bucket that
    hot is an exact-dup cluster (run ``exact_dedup`` first) or a
    degenerate band; dropping costs recall only on such clusters. The
    verify stage is exact and uncapped by design (the r2 form forwarded
    ``max_df`` into verification, silently undercounting overlap inside
    large true near-dup clusters).

    ``verify_semi_join=True`` pre-filters the signature table to docs
    that appear in some candidate pair before the verify join — set it
    when candidates ≪ corpus (the 10¹²-doc regime) so the verify join
    shuffles only candidate signatures; leave False when candidate
    coverage is near the corpus (small corpora), where the semi-join
    is pure overhead.

    PERSIST LIFETIME: the signature table (and, under
    ``verify_semi_join``, the candidate pairs) is ``persist()``-ed
    because two downstream branches consume it — and it stays cached
    until the returned DataFrame is garbage-collected or the session's
    ContextCleaner reclaims it. The ``hs`` column (~1k longs/doc) makes
    it the largest intermediate of the job, so callers that invoke this
    repeatedly in one session should pass ``cleanup=[]``: every
    persisted frame is appended to it, and after the result has been
    fully consumed (collected/written) call ``df.unpersist()`` on each
    to release the blocks deterministically.
    """
    import pandas as pd

    sig = (
        df.select(
            F.col(id_col).alias("_id"),
            lsh_signature_udf(k, n_hashes, bands)(F.col(text_col)).alias("_s"),
        )
        # struct first, fields second: two getField projections on the
        # UDF call itself would each embed a full UDF eval (the
        # double-eval trap tests/test_plans.py guards elsewhere)
        .select("_id", F.col("_s.keys").alias("_keys"), F.col("_s.hs").alias("_hs"))
        .persist()
    )
    if cleanup is not None:
        cleanup.append(sig)
    band_entries = sig.select("_id", F.explode("_keys").alias("key"))

    groups = (
        band_entries.groupBy("key")
        .agg(F.collect_list("_id").alias("_ids"))
        .where(F.size("_ids") > 1)
        .select("_ids")
    )
    groups = _cap_groups(groups, "_ids", max_df, observation)

    def emit_pairs(batches):
        import numpy as np

        triu = {}
        for pdf in batches:
            ca, cb = [], []
            for ids in pdf["_ids"]:
                ds = np.unique(np.asarray(ids, dtype=np.int64))  # sort+dedup
                g = len(ds)
                if g < 2:
                    continue
                t = triu.get(g)
                if t is None:
                    t = np.triu_indices(g, 1)
                    triu[g] = t
                xi, yi = t
                ca.append(ds[xi])
                cb.append(ds[yi])
            if ca:
                yield pd.DataFrame(
                    {"id_a": np.concatenate(ca), "id_b": np.concatenate(cb)}
                )
            else:
                yield pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")

    cand = (
        groups.mapInPandas(emit_pairs, schema="id_a long, id_b long").distinct()
    )

    sig_v = sig
    if verify_semi_join:
        # cand feeds the id-set AND the verify join below — persist so
        # the band-group subtree doesn't execute twice
        cand = cand.persist()
        if cleanup is not None:
            cleanup.append(cand)
        cand_ids = (
            cand.select(F.col("id_a").alias("_id"))
            .unionByName(cand.select(F.col("id_b").alias("_id")))
            .distinct()
        )
        sig_v = sig.join(cand_ids, "_id", "left_semi")

    a = sig_v.select(F.col("_id").alias("id_a"), F.col("_hs").alias("_ha"))
    b = sig_v.select(F.col("_id").alias("id_b"), F.col("_hs").alias("_hb"))
    joined = cand.join(a, "id_a").join(b, "id_b")

    def _verify(batches):
        import numpy as np

        for pdf in batches:
            ids_a, ids_b, js = [], [], []
            for ia, ib, ha, hb in zip(
                pdf["id_a"], pdf["id_b"], pdf["_ha"], pdf["_hb"]
            ):
                ha = np.frombuffer(ha, dtype=np.int64)
                hb = np.frombuffer(hb, dtype=np.int64)
                common = np.intersect1d(ha, hb, assume_unique=True).size
                union = ha.size + hb.size - common
                # same filter-then-round order as ngram_jaccard_pairs:
                # threshold on the raw IEEE ratio, round at the end
                if union and common / union >= threshold:
                    ids_a.append(ia)
                    ids_b.append(ib)
                    js.append(common / union)
            yield pd.DataFrame(
                {
                    "id_a": np.asarray(ids_a, dtype=np.int64),
                    "id_b": np.asarray(ids_b, dtype=np.int64),
                    "jaccard": np.asarray(js, dtype=np.float64),
                }
            )

    out = joined.mapInPandas(_verify, schema="id_a long, id_b long, jaccard double")
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


# -------------------------------------------------------------- SimHash

def simhash_udf(n_bits: int = 64):
    """pandas UDF: text → 64-bit simhash (as long). Word-level FNV
    hashes, bit-majority vote — deterministic."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    _fnv = _make_fnv64_memo()

    def _simhash(texts):
        out = []
        for t in texts.fillna(""):
            words = t.lower().split()
            if not words:
                out.append(0)
                continue
            acc = np.zeros(n_bits, dtype=np.int64)
            for w in words:
                h = _fnv(w)
                bits = (h >> np.arange(n_bits, dtype=np.uint64)) & 1
                acc += np.where(bits == 1, 1, -1)
            sig = 0
            for i in range(n_bits):
                if acc[i] > 0:
                    sig |= 1 << i
            # two's-complement into signed 64-bit for Spark LongType
            if sig >= 1 << 63:
                sig -= 1 << 64
            out.append(sig)
        return pd.Series(out, dtype="int64")

    import pandas as pd  # noqa: F811

    _simhash.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return F.pandas_udf(_simhash, T.LongType())


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_df: Optional[int] = None,
    observation=None,
    bands: Optional[int] = None,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ k.

    Block by rotating band keys. The band count ADAPTS to
    ``max_hamming`` (pigeonhole: hamming ≤ k pairs share ≥1 exact band
    iff bands > k): 4×16-bit bands for k ≤ 3, 8×8-bit for k ≤ 7 —
    the coarsest lossless banding, because fewer/wider bands mean
    fewer, colder (band, key) groups. k ≥ 8 keeps 8×8 banding and is
    RECALL-LOSSY (pass ``bands=16`` for lossless ≤ 15, at the cost of
    4-bit keys whose groups run ~N/16 hot — the ``max_df`` cap is then
    mandatory at scale). Pairs are emitted per (band, key) GROUP — the
    same single-pass
    group-emission + ``_cap_groups(max_df)`` pattern as its three
    siblings (ngram/minhash/embedding-LSH), never a row-level
    self-join: a 16-bit key space means a 10¹²-doc corpus averages
    ~10⁷ docs per bucket, and an uncapped bucket join would emit
    ~10¹⁴ pairs per bucket before any Hamming filter. The Hamming
    verify runs vectorized (numpy xor + byte-popcount) INSIDE the
    emission, so only passing pairs ever materialize.
    """
    import pandas as pd

    sh = df.select(F.col(id_col).alias("_id"), simhash_udf()(F.col(text_col)).alias("_sim"))
    if bands is None:
        bands = 4 if max_hamming <= 3 else 8
    width = 64 // bands
    entries = sh.select(
        "_id",
        "_sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("_sim"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("_id", "_sim", "bk.band", "bk.key")
    groups = (
        entries.groupBy("band", "key")
        .agg(F.collect_list(F.struct("_id", "_sim")).alias("_docs"))
        .where(F.size("_docs") > 1)
        .select("_docs")
    )
    groups = _cap_groups(groups, "_docs", max_df, observation)

    def emit_pairs(batches):
        import numpy as np

        pop8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
        triu = {}
        for pdf in batches:
            ca, cb, ch = [], [], []
            for docs in pdf["_docs"]:
                g = len(docs)
                if g < 2:
                    continue
                ids = np.fromiter((d["_id"] for d in docs), dtype=np.int64, count=g)
                sims = np.fromiter((d["_sim"] for d in docs), dtype=np.int64, count=g)
                order = np.argsort(ids, kind="stable")
                ids, sims = ids[order], sims[order]
                t = triu.get(g)
                if t is None:
                    t = np.triu_indices(g, 1)
                    triu[g] = t
                xi, yi = t
                x = np.bitwise_xor(sims[xi].view(np.uint64), sims[yi].view(np.uint64))
                hd = pop8[x.view(np.uint8).reshape(-1, 8)].sum(axis=1).astype(np.int32)
                m = hd <= max_hamming
                if m.any():
                    ca.append(ids[xi][m])
                    cb.append(ids[yi][m])
                    ch.append(hd[m])
            if ca:
                yield pd.DataFrame(
                    {
                        "id_a": np.concatenate(ca),
                        "id_b": np.concatenate(cb),
                        "hamming": np.concatenate(ch).astype("int32"),
                    }
                )
            else:
                yield pd.DataFrame(
                    {
                        "id_a": np.array([], dtype=np.int64),
                        "id_b": np.array([], dtype=np.int64),
                        "hamming": np.array([], dtype=np.int32),
                    }
                )

    return (
        groups.mapInPandas(emit_pairs, schema="id_a long, id_b long, hamming int")
        .distinct()
    )


def dedup_components(
    pairs: DataFrame,
    all_ids: Optional[DataFrame] = None,
    id_col: str = "doc_id",
    max_iters: int = 25,
    pointer_jump: bool = True,
) -> DataFrame:
    """Connected components over near-dup pairs → (id, component_id)
    with ``component_id = min id of the component`` — the step that
    turns pairwise dedup output into an actual KEEP LIST (keep rows
    where id == component_id, drop the rest).

    Algorithm: iterative min-label propagation (the Hash-to-Min family,
    Rastogi et al. 2013): every node repeatedly adopts the smallest
    label among itself and its neighbors until a fixpoint. With
    ``pointer_jump`` (default) each round ALSO adopts the label of its
    label (pointer doubling) — one extra node-table self-join per
    round, but the label deficit halves-then-doubles away so rounds
    needed drop from graph diameter to O(log diameter): a pathological
    10⁴-link near-dup chain converges in ~15 rounds instead of 10⁴.
    Each round is one join + one aggregate on the EDGE list (near-dup
    graphs are tiny next to the corpus — edges ≪ docs after capping),
    hard-capped at ``max_iters``. Each round's label frame is
    ``localCheckpoint``ed (eager): iterative DataFrame algorithms MUST
    truncate lineage every round or the logical plan doubles per
    iteration and the planner itself OOMs around round ~10 (measured
    on a 10-node path graph); on a cluster with a checkpoint dir, swap
    for ``checkpoint()``.

    Convergence detection costs NO extra job: each round carries the
    previous label through the aggregate (``min`` over the single
    non-null ``_old`` per group) and an ``Observation`` counts
    shrunken labels during the same action that materializes the
    checkpoint — one Spark job per round, not join+count on top.

    Exceeding ``max_iters`` without a fixpoint RAISES: a silently
    unconverged result would split true components and the derived
    keep-list would retain duplicates. Real near-dup graphs have small
    diameter; hitting the cap means the cap is too low for the graph —
    pass a larger ``max_iters``.

    ``all_ids`` (optional, e.g. ``df.select("doc_id")``): include
    singleton docs (no near-dup) as their own component; otherwise only
    ids appearing in some pair are returned.
    """
    from pyspark.sql import Observation

    if max_iters < 1:
        raise ValueError("max_iters must be >= 1")
    # undirected edge list, both directions (propagation is symmetric)
    e = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    e = e.distinct().persist()

    labels = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    changed = None
    for _ in range(max_iters):
        # candidate labels: own (tagged with _old=own lbl) + the label
        # of every neighbor (_old NULL) — min(_old) per group recovers
        # the previous label with no second join
        own = labels.withColumn("_old", F.col("lbl"))
        neighbor = (
            e.join(labels.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                "lbl",
                F.lit(None).cast("long").alias("_old"),
            )
        )
        cand = own.unionByName(neighbor)
        if pointer_jump:
            # label-of-label: lbl is itself a node of the same
            # component, so adopting ITS label is sound and doubles
            # the propagation distance per round
            lofl = (
                labels.alias("l1")
                .join(
                    labels.select(
                        F.col("node").alias("lbl"),
                        F.col("lbl").alias("_ll"),
                    ),
                    "lbl",
                )
                .select(
                    "node",
                    F.col("_ll").alias("lbl"),
                    F.lit(None).cast("long").alias("_old"),
                )
            )
            cand = cand.unionByName(lofl)
        obs = Observation()
        new_labels = (
            cand.groupBy("node")
            .agg(F.min("lbl").alias("lbl"), F.min("_old").alias("_old"))
            .observe(
                obs,
                F.count(F.when(F.col("lbl") < F.col("_old"), 1)).alias("changed"),
            )
            .drop("_old")
            # eager checkpoint = the round's ONE job; it both truncates
            # lineage and fires the observation (verified: a lazy
            # checkpoint's LogicalRDD plan drops the metrics)
            .localCheckpoint(eager=True)
        )
        changed = obs.get["changed"]
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        raise ValueError(
            f"dedup_components did not converge within max_iters={max_iters} "
            f"({changed} labels still shrinking) — the graph diameter exceeds "
            "the cap; rerun with a larger max_iters"
        )
    out = labels.select(
        F.col("node").alias(id_col), F.col("lbl").alias("component_id")
    )
    if all_ids is not None:
        singles = all_ids.select(F.col(id_col)).join(
            out.select(id_col), id_col, "left_anti"
        ).withColumn("component_id", F.col(id_col))
        out = out.unionByName(singles)
    return out


def embedding_near_dups_blocked(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    block_size: int = 1024,
) -> DataFrame:
    """Blocked-GEMM exact near-dup: the scale path for all-pairs cosine.

    Rows are grouped into ⌈n/block⌉ blocks; the self-join happens on
    BLOCK pairs (B(B+1)/2 rows, each carrying two vector blocks), and
    each block pair computes its full similarity sub-matrix with one
    numpy float64 matmul inside ``applyInPandas`` — 25M dots become a
    handful of GEMMs instead of 25M interpreted expressions. Exact
    (same float64 math, rounded to 6dp) and embarrassingly parallel:
    at 10^9 vectors pair-blocking composes with LSH pre-bucketing.
    """
    import pandas as pd

    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).withColumn("_blk", (F.col("_id") / block_size).cast("long"))

    # ONE row per block, FLAT layout: (block_id, ids[], flat vectors[])
    # — a flat array<double> crosses Arrow as one contiguous buffer and
    # reshapes zero-copy in numpy, where the old list-of-struct rows
    # cost a per-element Python conversion on every one of the B
    # replicas of each block (guide §4.2: re-slice buffers, don't copy
    # rows). Both collect_lists aggregate rows in the same order within
    # the one aggregate execution, so ids and vectors stay aligned.
    blocks = base.groupBy("_blk").agg(
        F.collect_list("_id").alias("_ids"),
        F.flatten(F.collect_list("_v")).alias("_vs"),
    )
    a = blocks.select(
        F.col("_blk").alias("blk_a"),
        F.col("_ids").alias("ids_a"),
        F.col("_vs").alias("vs_a"),
    )
    b = blocks.select(
        F.col("_blk").alias("blk_b"),
        F.col("_ids").alias("ids_b"),
        F.col("_vs").alias("vs_b"),
    )
    pairs = a.join(b, F.col("blk_a") <= F.col("blk_b"))

    def block_sim(batches):
        import numpy as np

        for pdf in batches:
            out_a, out_b, out_c = [], [], []
            for ids_a, ids_b, vs_a, vs_b in zip(
                pdf["ids_a"], pdf["ids_b"], pdf["vs_a"], pdf["vs_b"]
            ):
                ids_a = np.asarray(ids_a, dtype=np.int64)
                ids_b = np.asarray(ids_b, dtype=np.int64)
                A = np.asarray(vs_a, dtype=np.float64).reshape(len(ids_a), -1)
                B = np.asarray(vs_b, dtype=np.float64).reshape(len(ids_b), -1)
                A = A / np.linalg.norm(A, axis=1, keepdims=True)
                B = B / np.linalg.norm(B, axis=1, keepdims=True)
                S = A @ B.T
                ia, ib = np.nonzero(S >= threshold)
                ka, kb = ids_a[ia], ids_b[ib]
                keep = ka < kb
                out_a.extend(ka[keep])
                out_b.extend(kb[keep])
                out_c.extend(np.round(S[ia, ib][keep], 6))
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine": out_c})

    return pairs.select("ids_a", "ids_b", "vs_a", "vs_b").mapInPandas(
        block_sim, schema="id_a long, id_b long, cosine double"
    )


# ------------------------------------------------- embedding near-dup

def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns — pure JVM
    (zip_with + aggregate), no UDF. Generic (any dim) but interpreted;
    for hot pair-join paths use ``dot_fixed`` + precomputed norms."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def dot_fixed(a: Column, b: Column, dim: int) -> Column:
    """Dot product expanded to ``dim`` element_at terms — stays inside
    whole-stage codegen (higher-order array lambdas do not), ~20×
    faster on O(n²) pair joins."""
    terms = [
        F.element_at(a, i + 1) * F.element_at(b, i + 1) for i in range(dim)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def norm_fixed(a: Column, dim: int) -> Column:
    return F.sqrt(dot_fixed(a, a, dim))


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    ids: Optional[List[int]] = None,
    dim: Optional[int] = None,
) -> DataFrame:
    """Cosine ≥ threshold pairs. Brute pair join (id_a < id_b) — the
    exactness baseline; at scale use similarity.hyperplane_lsh_join to
    bucket first (same verify step).

    Pass ``dim`` when known — inference costs an extra ``first()`` job;
    a wrong declared value raises per-row (``dim_check``)."""
    from contessa_spark.operators.similarity import dim_check

    base = df.select(F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v"))
    if ids is not None:
        base = base.where(F.col("_id").isin(ids))
    if dim is None:
        # dim from the schema-carrying first row; norms computed ONCE per
        # row before the pair join (n rows) instead of per pair (n²)
        first = base.select(F.size("_v")).first()
        if first is None:
            return base.sparkSession.createDataFrame(
                [], "id_a long, id_b long, cosine double"
            )
        dim = first[0]
    normed = base.where(dim_check(F.col("_v"), dim)).withColumn(
        "_n", norm_fixed(F.col("_v"), dim)
    )
    a = normed.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"), F.col("_n").alias("na"))
    b = normed.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"), F.col("_n").alias("nb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            dot_fixed(F.col("va"), F.col("vb"), dim) / (F.col("na") * F.col("nb")),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


# ------------------------------------------- substring-level exact dedup

def positional_gram_hashes_udf(k: int = 5):
    """pandas UDF: text → array<long> of FNV-64 word-k-gram hashes, ONE
    PER POSITION (index i = gram over words[i..i+k-1]; n_words−k+1
    entries, empty when the doc has < k words). Unlike ``shingles``
    this keeps duplicates and order — positions are the unit the
    substring pass flags. Raw case (exact-substring dedup is exact);
    whitespace split, same (?U)\\s contract as the rest of the engine."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    _fnv64 = _make_fnv64_memo()

    def _gh(texts):
        out = []
        for t in texts:
            words = (t if isinstance(t, str) else "").split()
            n = len(words)
            if n < k:
                out.append([])
                continue
            hs = np.fromiter(
                (_fnv64(" ".join(words[i : i + k])) for i in range(n - k + 1)),
                dtype=np.uint64,
                count=n - k + 1,
            )
            out.append(hs.view(np.int64).tolist())
        return pd.Series(out)

    _gh.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return F.pandas_udf(_gh, T.ArrayType(T.LongType()))


def _strip_spans_udf(k: int):
    """pandas UDF: (text, flagged gram starts) → struct(clean_text,
    n_words, n_removed_words, n_spans). A flagged start p covers words
    [p, p+k); overlapping/adjacent covers merge into maximal runs
    (the per-doc maximal-run merge of Lee et al. §4.1); kept words
    rejoin with single spaces (word-level dedup normalizes whitespace
    by construction)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    def _strip(texts, flags):
        clean, nw, nr, ns = [], [], [], []
        for t, fl in zip(texts, flags):
            words = (t if isinstance(t, str) else "").split()
            n = len(words)
            if fl is None or len(fl) == 0:
                clean.append(" ".join(words))
                nw.append(n)
                nr.append(0)
                ns.append(0)
                continue
            covered = np.zeros(n, dtype=bool)
            for p in fl:
                covered[p : p + k] = True
            kept = [w for w, c in zip(words, covered) if not c]
            # span count = runs of covered: rising edges of the mask
            edges = int(covered[0]) + int(
                np.count_nonzero(covered[1:] & ~covered[:-1])
            )
            clean.append(" ".join(kept))
            nw.append(n)
            nr.append(int(covered.sum()))
            ns.append(edges)
        return pd.DataFrame(
            {
                "clean_text": clean,
                "n_words": np.asarray(nw, dtype=np.int64),
                "n_removed_words": np.asarray(nr, dtype=np.int64),
                "n_spans": np.asarray(ns, dtype=np.int64),
            }
        )

    _strip.__annotations__ = {
        "texts": pd.Series,
        "flags": pd.Series,
        "return": pd.DataFrame,
    }
    return F.pandas_udf(
        _strip,
        T.StructType(
            [
                T.StructField("clean_text", T.StringType()),
                T.StructField("n_words", T.LongType()),
                T.StructField("n_removed_words", T.LongType()),
                T.StructField("n_spans", T.LongType()),
            ]
        ),
    )


def substring_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    cleanup: Optional[list] = None,
    keep_first: bool = True,
) -> DataFrame:
    """Substring-level EXACT dedup (Lee et al. 2021 "Deduplicating
    Training Data" §4.1, the RefinedWeb/FineWeb exact-substring stage):
    every word span of length ≥ k that repeats anywhere in the corpus
    is removed from all occurrences EXCEPT the globally first one
    (ordered by (doc_id, position)); the surviving text keeps its word
    order, whitespace-normalized. The paper's unit is 50 BPE tokens;
    here the unit is whitespace words and ``k`` is the span threshold.

    Plan — and why it has NO quadratic stage (unlike the pair-emitting
    near-dup passes, no ``max_df`` cap is needed):

    1. ONE pandas-UDF pass per doc emits the k-gram FNV-64 hash at
       every word position; posexplode → (id, pos, gh). The narrow
       exploded frame is persisted — it feeds both the gram-frequency
       aggregate and the flag join, and re-running the gram UDF twice
       would double the only Python cost in the plan (pass
       ``cleanup=[]`` to unpersist deterministically, as in
       ``minhash_lsh_candidates``).
    2. Gram stats: groupBy(gh) → (count, min(struct(id, pos))). A
       COUNT aggregate with map-side partial combine — a gram repeated
       10⁹ times reduces to one row per map partition before the
       shuffle, so hot boilerplate grams never concentrate rows (the
       same shape as ``corpus_line_dedup``); contrast with posting-list
       collection, which would need capping.
    3. Flag positions: join grams back on gh (every probe row matches
       ≤ 1 stats row — linear, AQE skew-join splits hot grams),
       keep occurrences of count>1 grams that are NOT the global first.
    4. Per-doc flag lists: groupBy(id) collect_list(pos) — bounded by
       doc length.
    5. Rebuild: left-join flags onto the input, one pandas UDF strips
       the maximal covered runs (a span of length L ≥ k shared with an
       earlier occurrence has all its L−k+1 gram positions flagged, so
       the union of [p, p+k) covers exactly the span).

    Output: (id, clean_text, n_words, n_removed_words, n_spans).

    Self-repetition falls out for free: "a b c a b c" at k=3 flags the
    second "a b c" (its gram's first occurrence is position 0 of the
    same doc).

    ``keep_first=False`` strips EVERY occurrence of a duplicated span
    (Lee et al. also evaluate this variant — it guarantees no
    repeated span survives anywhere, at the cost of losing the
    canonical copy too); the aggregate then needs only the count, not
    the first-occurrence struct.
    """
    # asNondeterministic: pins the (pure) gram UDF above any caller's
    # spread exchange — deterministic UDF projections get pushed below
    # it and re-extracted above, running the whole gram pass twice
    # (once on the unspread scan); see the same fix on the jaccard
    # paths (guide §4.4)
    grams = (
        df.select(
            F.col(id_col).alias("_id"),
            positional_gram_hashes_udf(k)
            .asNondeterministic()(F.col(text_col))
            .alias("_ghs"),
        )
        .select("_id", F.posexplode("_ghs").alias("pos", "gh"))
        .persist()
    )
    if cleanup is not None:
        cleanup.append(grams)

    if keep_first:
        dup_grams = (
            grams.groupBy("gh")
            .agg(
                F.count(F.lit(1)).alias("_cnt"),
                F.min(F.struct(F.col("_id"), F.col("pos"))).alias("_first"),
            )
            .where(F.col("_cnt") > 1)
            .select("gh", "_first")
        )
        flagged = (
            grams.join(dup_grams, "gh")
            .where(
                ~(
                    (F.col("_first._id") == F.col("_id"))
                    & (F.col("_first.pos") == F.col("pos"))
                )
            )
            .select("_id", "pos")
        )
    else:
        dup_grams = (
            grams.groupBy("gh")
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .where(F.col("_cnt") > 1)
            .select("gh")
        )
        flagged = grams.join(dup_grams, "gh").select("_id", "pos")
    flags = flagged.groupBy("_id").agg(F.collect_list("pos").alias("_flags"))

    strip = _strip_spans_udf(k)
    out = (
        df.select(F.col(id_col), F.col(text_col))
        .join(flags.withColumnRenamed("_id", id_col), id_col, "left")
        # struct first, fields second — the UDF evaluates exactly once
        .select(F.col(id_col), strip(F.col(text_col), F.col("_flags")).alias("_s"))
        .select(
            id_col,
            F.col("_s.clean_text").alias("clean_text"),
            F.col("_s.n_words").alias("n_words"),
            F.col("_s.n_removed_words").alias("n_removed_words"),
            F.col("_s.n_spans").alias("n_spans"),
        )
    )
    return out
