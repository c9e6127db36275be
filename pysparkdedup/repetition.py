"""Repetition / boilerplate operators for training-data curation.

Two public-literature families the reference's per-mailbox model has no
analog for, but a web-scale corpus pipeline needs alongside dedup:

- ``repetition_stats`` — per-document repetition signals in the style of
  Gopher's repetition filters (Rae et al. 2021, "Scaling Language Models",
  appendix A1.1): fraction of characters in the most frequent n-gram and
  fraction of character mass in n-grams occurring more than once. Documents
  dominated by repeated n-grams are low-quality boilerplate/spam.

- ``drop_boilerplate_lines`` — corpus-level line deduplication in the style
  of CCNet (Wenzek et al. 2020): a line occurring in many documents
  (navigation chrome, cookie banners, footers) is boilerplate; drop it from
  every document while preserving the order of what remains.

Both are pure JVM column algebra (no Python UDFs).

Scale notes (100 TB):
- ``repetition_stats`` is SHUFFLE-FREE (plan-gated: zero Exchange nodes):
  per-doc sorted-gram run-length scan via ``aggregate`` — embarrassingly
  parallel, a mega-document costs only its own gram count within its task.
- ``drop_boilerplate_lines`` dehydrates: only the (id, line) projection
  rides the document-frequency aggregation (distinct-then-count; partial
  agg absorbs hot boilerplate lines because count is O(1) state); the
  rebuild filters each document's OWN lines array against broadcast-joined
  per-doc hits, so the corpus text never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens_expr(text_col: str = "text") -> Column:
    """Lowercased whitespace tokens (same tokenizer family as textstats)."""
    return F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: t != "",
    )


def grams_expr(tokens: Column, n: int) -> Column:
    """All (overlapping) word n-grams of a token array, space-joined.

    Guarded for short docs: ``sequence(1, 0)`` in Spark DESCENDS ([1, 0]),
    so the <n-token case must return an empty array explicitly."""
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def with_chunk_lines(
    df: DataFrame,
    tokens_per_line: int = 10,
    text_col: str = "text",
    out_col: str = "lines",
) -> DataFrame:
    """``df`` plus an ``out_col`` array of deterministic pseudo-lines.

    Materializes the token array into a column FIRST: passing the raw
    split() expression into the chunk lambda would re-evaluate tokenization
    once per chunk slice (no CSE inside lambda bodies) — O(len^2) per doc.
    """
    return (
        df.withColumn("_toks", tokens_expr(text_col))
        .withColumn(out_col,
                    chunk_lines_expr(F.col("_toks"), tokens_per_line))
        .drop("_toks")
    )


def chunk_lines_expr(tokens: Column, tokens_per_line: int) -> Column:
    """Deterministic pseudo-lines: consecutive ``tokens_per_line``-token
    chunks, space-joined. Gives newline-free corpora (like the synthetic
    documents table) a well-defined line unit; real web text uses
    ``split(text, '\\n')`` instead.

    ``tokens`` should be a MATERIALIZED column (see with_chunk_lines), not a
    raw split() expression — lambdas re-evaluate their captured expressions
    per element."""
    w = tokens_per_line
    n_chunks = F.ceil(F.size(tokens) / F.lit(w)).cast("int")
    return F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - F.lit(1)),
            lambda i: F.concat_ws(" ", F.slice(tokens, i * w + 1, w)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _rep_state(prev, run, tot, dup, n, dst, bc, bl, bg) -> Column:
    """Run-length scan state: current run (prev gram, length), totals, and
    the best-so-far (count, len, gram) under the lexicographic order."""
    return F.struct(
        prev.alias("prev"), run.alias("run"), tot.alias("tot"),
        dup.alias("dup"), n.alias("n"), dst.alias("dst"),
        bc.alias("bc"), bl.alias("bl"), bg.alias("bg"))


def repetition_stats(
    df: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram repetition signals (Gopher-style).

    Returns one row per input row with:
    - ``n_grams``        : total n-gram occurrences in the document;
    - ``distinct_grams`` : distinct n-grams;
    - ``top_gram_frac``  : chars of the most frequent n-gram times its count,
      over total n-gram-occurrence chars (ties broken by longer gram, then
      lexicographically larger gram — fully deterministic);
    - ``dup_gram_frac``  : char mass of n-grams occurring >= 2 times, over
      total n-gram-occurrence chars.

    Ratios are rounded to 4 decimals; documents with no n-grams get 0.0.

    Implementation is SHUFFLE-FREE: the stats are per-document, so instead of
    exploding every gram into a corpus-wide (id, gram) aggregation (a shuffle
    of the whole token stream), each document sorts its own gram array and a
    single JVM ``aggregate`` pass counts run lengths — embarrassingly
    parallel, scan → project, nothing moves between executors. A run's close
    folds its (count, len, gram) into the best-so-far with a struct
    comparison, reproducing ``max(struct(cnt, glen, gram))`` exactly (the
    empty-string sentinel never beats a real gram).

    Caller note: higher-order functions are CodegenFallback (interpreted,
    no cross-reference subexpression reuse), so FILTERING directly on a
    returned column lets Catalyst inline the whole aggregate into the
    filter predicate — measured ~7x the cost of projecting the same
    column. Materialize first (persist the slim (id, score) projection,
    as curate_pages does), then filter on the cached values.
    """
    zero = F.lit(0).cast("long")
    # Materialized token column: the gram lambda slices a computed array
    # instead of re-running split+filter per gram (O(len^2) otherwise).
    grams_sorted = F.array_sort(grams_expr(F.col("_rep_toks"), n))

    def close_run(acc):
        """(dup, dst, best) after folding the current run, if any."""
        plen = F.length(acc["prev"]).cast("long")
        ndup = acc["dup"] + F.when(
            acc["run"] >= 2, acc["run"] * plen).otherwise(zero)
        ndst = acc["dst"] + F.when(acc["run"] > 0, F.lit(1).cast("long")
                                   ).otherwise(zero)
        cand = F.struct(acc["run"].alias("bc"), plen.alias("bl"),
                        acc["prev"].alias("bg"))
        cur = F.struct(acc["bc"].alias("bc"), acc["bl"].alias("bl"),
                       acc["bg"].alias("bg"))
        best = F.when(cand > cur, cand).otherwise(cur)
        return ndup, ndst, best

    def merge(acc, g):
        glen = F.length(g).cast("long")
        ndup, ndst, best = close_run(acc)
        return F.when(
            acc["prev"] == g,
            _rep_state(g, acc["run"] + 1, acc["tot"] + glen, acc["dup"],
                       acc["n"] + 1, acc["dst"],
                       acc["bc"], acc["bl"], acc["bg"]),
        ).otherwise(
            _rep_state(g, F.lit(1).cast("long"), acc["tot"] + glen, ndup,
                       acc["n"] + 1, ndst,
                       best["bc"], best["bl"], best["bg"]),
        )

    def finish(acc):
        fdup, fdst, best = close_run(acc)
        safe = F.greatest(acc["tot"], F.lit(1)).cast("double")
        return F.struct(
            acc["n"].alias("n_grams"),
            fdst.alias("distinct_grams"),
            F.round((best["bc"] * best["bl"]) / safe, 4
                    ).alias("top_gram_frac"),
            F.round(fdup / safe, 4).alias("dup_gram_frac"),
        )

    init = _rep_state(F.lit(""), zero, zero, zero, zero, zero,
                      zero, zero, F.lit(""))
    out = F.aggregate(grams_sorted, init, merge, finish)
    return df.withColumn("_rep_toks", tokens_expr(text_col)).select(
        F.col(id_col),
        out["n_grams"].alias("n_grams"),
        out["distinct_grams"].alias("distinct_grams"),
        out["top_gram_frac"].alias("top_gram_frac"),
        out["dup_gram_frac"].alias("dup_gram_frac"),
    )


def line_doc_frequency(
    df: DataFrame,
    lines_col: str = "lines",
    id_col: str = "doc_id",
) -> DataFrame:
    """(line, df) — in how many distinct documents each line occurs.

    Exact: distinct (id, line) first (repeated lines inside one document
    count once), then count per line. Both shuffles carry count-only state.
    """
    exploded = df.select(
        F.col(id_col), F.explode(lines_col).alias("line"))
    return (
        exploded.distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("df"))
    )


def drop_boilerplate_lines(
    df: DataFrame,
    min_df: int,
    lines_col: str = "lines",
    id_col: str = "doc_id",
    keep_order: bool = True,
) -> DataFrame:
    """Remove every line occurring in >= ``min_df`` distinct documents
    (CCNet-style boilerplate filter).

    Input: a frame with an ``array<string>`` lines column (``split(text,
    '\\n')`` for real web text; ``chunk_lines_expr`` for newline-free
    corpora). Output: one row per document with
    - ``kept_lines`` : surviving lines, original order preserved;
    - ``clean_text`` : the surviving lines re-joined with ``'\\n'``;
    - ``n_lines`` / ``n_dropped`` : accounting.

    The document payload never shuffles (the engine's dehydration principle):
    only the light (id, line) projection rides the document-frequency
    aggregation, and the rebuild is an order-preserving JVM ``filter`` of
    each document's OWN lines array against its per-doc boilerplate hits —
    a frame bounded by (docs containing boilerplate) x (few lines each),
    which AQE broadcasts in the common regime; the fallback is a shuffle
    join keyed on id that still moves only the hit lines, not the corpus.

    The boilerplate dim itself is deliberately NOT hint-broadcast: unlike
    the engine's capped hot-key dims (pairs/ngram/suffix), every distinct
    line with df >= min_df qualifies, which at web scale is an unbounded
    set (every footer variant in the crawl). AQE decides at runtime from
    the aggregated size — broadcast when it fits, shuffle join (count-only
    state, partial-agg absorbed) when it does not.
    """
    del keep_order  # order is always preserved by the array filter
    from pyspark import StorageLevel

    from .cache import track

    # The light (id, line) projection feeds BOTH the frequency count and the
    # per-doc hit set; persist it so the caller's lines expression (often a
    # chunking transform) evaluates once, not per consumer.
    light = track(
        df.select(F.col(id_col), F.explode(lines_col).alias("line"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    boiler = (
        light.distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("line")
    )

    bad_per_doc = (
        light.join(boiler, "line", "inner")
        .groupBy(id_col)
        .agg(F.collect_set("line").alias("_bad"))
    )

    joined = df.select(
        F.col(id_col),
        F.greatest(F.size(lines_col), F.lit(0)).alias("n_lines"),
        F.coalesce(
            F.col(lines_col), F.array().cast("array<string>")
        ).alias("_lines"),
    ).join(bad_per_doc, id_col, "left")

    kept = F.when(
        F.col("_bad").isNull(), F.col("_lines")
    ).otherwise(
        F.filter(F.col("_lines"),
                 lambda ln: ~F.array_contains(F.col("_bad"), ln)))
    return joined.select(
        id_col,
        "n_lines",
        kept.alias("kept_lines"),
    ).select(
        id_col,
        "n_lines",
        "kept_lines",
        F.concat_ws("\n", "kept_lines").alias("clean_text"),
        (F.col("n_lines") - F.size("kept_lines")).alias("n_dropped"),
    )


def dedup_lines_keep_first(
    df: DataFrame,
    lines_col: str = "lines",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide line/paragraph dedup, keep-FIRST semantics (the Dolma
    paragraph-dedup family: a paragraph seen before anywhere in the corpus
    is removed; its first occurrence survives). Distinct from
    ``drop_boilerplate_lines``, which removes EVERY copy of a frequent line.

    "First" is fully deterministic: the minimal (id, position) under
    lexicographic struct order — the same occurrence regardless of
    partitioning or parallelism. Output mirrors drop_boilerplate_lines:
    ``n_lines`` / ``n_dropped`` / ``kept_lines`` (original order) /
    ``clean_text``.

    Scale notes (100 TB): only the dehydrated (id, pos, line) projection
    rides any shuffle — the winner-per-line aggregation carries O(1) state
    (min-struct, count), so a paragraph duplicated across 10^10 documents is
    absorbed by map-side partial aggregation; the winner dim keeps only
    lines with >= 2 occurrences (unique lines can never be dropped), and the
    occurrence->winner equi-join is left to AQE (broadcast when the dup dim
    is small, skew-split when one line dominates). The rebuild drops by
    POSITION (an int array bounded by each document's own line count), so
    document text never shuffles and intra-doc repeats of the winning line
    are removed precisely."""
    from pyspark import StorageLevel

    from .cache import track

    light = track(
        df.select(F.col(id_col),
                  F.posexplode(lines_col).alias("pos", "line"))
        .persist(StorageLevel.MEMORY_AND_DISK))

    # One winner per duplicated line: minimal (id, pos) occurrence.
    winners = (
        light.groupBy("line")
        .agg(F.count(F.lit(1)).alias("n"),
             F.min(F.struct(F.col(id_col).alias("id"),
                            F.col("pos").alias("pos"))).alias("first"))
        .filter(F.col("n") >= 2)
        .select("line", "first")
    )

    drops = (
        light.join(winners, "line", "inner")
        .filter(~((F.col(id_col) == F.col("first.id"))
                  & (F.col("pos") == F.col("first.pos"))))
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("_drop"))
    )

    joined = df.select(
        F.col(id_col),
        F.greatest(F.size(lines_col), F.lit(0)).alias("n_lines"),
        F.coalesce(
            F.col(lines_col), F.array().cast("array<string>")
        ).alias("_lines"),
    ).join(drops, id_col, "left")

    kept = F.when(
        F.col("_drop").isNull(), F.col("_lines")
    ).otherwise(
        F.filter(F.col("_lines"),
                 lambda _ln, i: ~F.array_contains(F.col("_drop"), i)))
    return joined.select(
        id_col,
        "n_lines",
        kept.alias("kept_lines"),
    ).select(
        id_col,
        "n_lines",
        "kept_lines",
        F.concat_ws("\n", "kept_lines").alias("clean_text"),
        (F.col("n_lines") - F.size("kept_lines")).alias("n_dropped"),
    )
