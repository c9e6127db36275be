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

Both are pure JVM column algebra (no Python UDFs): explode + two-phase
partial aggregation, keyed per document (no cross-doc skew) for the stats,
and an AQE-broadcastable frequency join for the line filter.

Scale notes (100 TB):
- ``repetition_stats`` shuffles on (id, gram) then id; both aggregations are
  map-side partial, and every group is bounded by a single document's length
  — a mega-document cannot straggle more than its own gram count.
- ``drop_boilerplate_lines`` aggregates line document-frequency with a
  distinct-then-count (two shuffles on line hash; partial agg absorbs hot
  boilerplate lines because count is O(1) state), and the join back to drop
  them touches only lines ABOVE the threshold — a small frame AQE broadcasts
  in practice; when it isn't small the join degrades to a shuffle hash join,
  still correct.
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


def chunk_lines_expr(tokens: Column, tokens_per_line: int) -> Column:
    """Deterministic pseudo-lines: consecutive ``tokens_per_line``-token
    chunks, space-joined. Gives newline-free corpora (like the synthetic
    documents table) a well-defined line unit; real web text uses
    ``split(text, '\\n')`` instead."""
    w = tokens_per_line
    n_chunks = F.ceil(F.size(tokens) / F.lit(w)).cast("int")
    return F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - F.lit(1)),
            lambda i: F.concat_ws(" ", F.slice(tokens, i * w + 1, w)),
        ),
    ).otherwise(F.array().cast("array<string>"))


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
    """
    toks = tokens_expr(text_col)
    grams = df.select(
        F.col(id_col),
        F.explode_outer(grams_expr(toks, n)).alias("gram"),
    )
    per_gram = grams.filter(F.col("gram").isNotNull()).groupBy(
        id_col, "gram").agg(F.count(F.lit(1)).alias("cnt"))
    per_gram = per_gram.withColumn("glen", F.length("gram"))

    stats = per_gram.groupBy(id_col).agg(
        F.sum("cnt").alias("n_grams"),
        F.count(F.lit(1)).alias("distinct_grams"),
        F.sum(F.col("cnt") * F.col("glen")).alias("_total_chars"),
        F.sum(F.when(F.col("cnt") >= 2, F.col("cnt") * F.col("glen"))
              .otherwise(F.lit(0))).alias("_dup_chars"),
        F.max(F.struct("cnt", "glen", "gram")).alias("_top"),
    )
    safe = F.greatest(F.col("_total_chars"), F.lit(1)).cast("double")
    stats = stats.select(
        id_col,
        "n_grams",
        "distinct_grams",
        F.round(
            (F.col("_top.cnt") * F.col("_top.glen")) / safe, 4
        ).alias("top_gram_frac"),
        F.round(F.col("_dup_chars") / safe, 4).alias("dup_gram_frac"),
    )
    # left join keeps gram-free docs (empty text) with zeroed signals
    return df.select(id_col).join(stats, id_col, "left").select(
        id_col,
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.coalesce("distinct_grams", F.lit(0)).alias("distinct_grams"),
        F.coalesce("top_gram_frac", F.lit(0.0)).alias("top_gram_frac"),
        F.coalesce("dup_gram_frac", F.lit(0.0)).alias("dup_gram_frac"),
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

    Only lines AT OR ABOVE the threshold ride the filter join — the
    boilerplate set, a tiny fraction of distinct lines, which AQE broadcasts
    when it fits (no shuffle of the exploded corpus side) and falls back to
    a shuffle hash join when it doesn't.
    """
    boiler = line_doc_frequency(df, lines_col, id_col).filter(
        F.col("df") >= min_df).select("line")

    pos_lines = df.select(
        F.col(id_col),
        F.posexplode_outer(lines_col).alias("pos", "line"),
    )
    kept = pos_lines.join(boiler, "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "line"))).alias("_ordered"),
    )
    lines_out = F.transform(F.col("_ordered"), lambda s: s["line"])
    if not keep_order:  # pragma: no cover - order always kept today
        lines_out = F.array_sort(lines_out)
    rebuilt = rebuilt.select(
        id_col,
        F.filter(lines_out, lambda x: x.isNotNull()).alias("kept_lines"),
    )

    base = df.select(
        id_col,
        F.greatest(F.size(lines_col), F.lit(0)).alias("n_lines"))
    return base.join(rebuilt, id_col, "left").select(
        id_col,
        "n_lines",
        F.coalesce(
            "kept_lines", F.array().cast("array<string>")
        ).alias("kept_lines"),
    ).select(
        id_col,
        "n_lines",
        "kept_lines",
        F.concat_ws("\n", "kept_lines").alias("clean_text"),
        (F.col("n_lines") - F.size("kept_lines")).alias("n_dropped"),
    )
