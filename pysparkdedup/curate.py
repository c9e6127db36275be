"""One-call training-data curation pass composing the engine's corpus
filters — the user-facing analog of the reference's single `mdedup` verb
(ref cli.py:656-674's one-command pipeline), applied to web-text curation
instead of mailbox dedup.

Stage order follows the public curation-pipeline literature (Gopher / CCNet
/ Dolma): document-level repetition filter first (drop spam before paying
for corpus-wide aggregations), then corpus-level boilerplate removal, then
keep-first paragraph dedup, then PII redaction on the surviving text.

Scale notes (100 TB): every stage reuses the shuffle-discipline of its
module — repetition_stats is shuffle-free and the line ops dehydrate (only
(id, line/pos) projections shuffle) — but the COMPOSITION is flattened
rather than chained: both line-stage verdict dims (boilerplate hit sets,
keep-first drop positions) are derived from one persisted exploded frame
and applied in a single order-preserving array filter, so tokenization,
the repetition gram sort, and the text rebuild each run exactly once per
pass (chaining the standalone ops re-executes the corpus lineage per
stage — Spark has no DAG-level CSE; measured 4-6x re-compute). The full
text column rides exactly one id-keyed rebuild join, never an aggregation.

Line units are selectable (``line_mode``): ``"newline"`` splits on real
``'\\n'`` — the right choice for web text, and LOSSLESS for documents that
lose no lines (split + re-join with ``'\\n'`` is an exact inverse, so case
and layout survive); ``"chunk"`` uses normalized 10-token pseudo-lines
(lowercased, whitespace-collapsed) for newline-free corpora — same
convention as the driver-contract line queries, and destructive by design
(text is rewritten in pseudo-line space); ``"auto"`` picks per document
(real lines when the doc contains ``'\\n'``, pseudo-lines otherwise), the
safe default posture for mixed crawls where ``"newline"`` would silently
exempt newline-free docs from both line stages.

Blank lines (empty or whitespace-only) are structure, not content: both
line stages pass them through untouched — they never enter the boilerplate
document-frequency aggregation and never compete in the keep-first winner
pick, matching the public paragraph-dedup pipelines (Dolma/CCNet skip
empty/trivial lines). Without the exemption, every blank line in a
newline-split web corpus is one shared "value" that keep-first dedup
would collapse corpus-wide, flattening the paragraph structure of
essentially every multi-paragraph document. Chunk pseudo-lines are never
blank, so the exemption is a no-op in chunk mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pii import redact_pii
from .repetition import repetition_stats, with_chunk_lines


def curate_pages(
    pages: DataFrame,
    *,
    max_dup_gram_frac: float | None = None,
    boilerplate_min_df: int = 0,
    dedup_paragraphs: bool = False,
    redact: bool = False,
    drop_empty: bool = False,
    tokens_per_line: int = 10,
    line_mode: str = "chunk",
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Returns ``pages`` with low-quality documents dropped and ``text_col``
    rewritten per the enabled stages. All stages default OFF; enabling none
    returns the input unchanged. Schema is preserved.

    - ``max_dup_gram_frac``  : drop documents whose duplicate-2-gram char
      fraction exceeds this (Gopher-style repetition filter);
    - ``boilerplate_min_df`` : > 0 removes every line occurring in that many
      distinct documents (CCNet-style);
    - ``dedup_paragraphs``   : keep-first corpus-wide line dedup
      (Dolma-style);
    - ``redact``             : scrub PII with typed placeholders (pii.py);
    - ``line_mode``          : line unit for the two line stages —
      ``"newline"`` (real ``'\\n'`` lines; lossless for untouched docs),
      ``"chunk"`` (normalized ``tokens_per_line``-token pseudo-lines for
      newline-free corpora; rewrites text in pseudo-line space), or
      ``"auto"`` (per document: real lines when the doc contains ``'\\n'``,
      pseudo-lines otherwise — mixed-crawl safe).

    - ``drop_empty``         : drop documents whose FINAL text has no
      non-whitespace content — docs fully consumed by the line stages
      (e.g. an exact duplicate whose every line lost corpus-wide
      keep-first dedup) as well as docs that arrived empty. The standard
      tail step of public curation pipelines; matters especially ahead
      of trainpipe's dedup cascade, where blank docs are unconditional
      singletons the exact tier cannot collapse. A stateless JVM regexp
      filter — no shuffle.

    Blank (whitespace-only) lines are exempt from both line stages — see
    the module docstring.
    """
    if line_mode not in ("chunk", "newline", "auto"):
        raise ValueError(
            f"line_mode must be 'chunk', 'newline' or 'auto', "
            f"got {line_mode!r}")
    from pyspark import StorageLevel

    from .cache import track

    cur = pages
    if max_dup_gram_frac is not None:
        reps = repetition_stats(cur, n=2, id_col=id_col, text_col=text_col)
        # Persist the slim (id, score) frame BEFORE filtering, for two
        # compounding reasons. (1) No DAG-level CSE: every downstream
        # consumer of `cur` re-executes its lineage, and the repetition
        # gram sort + run-length aggregate is the most expensive per-doc
        # expression in the pass — measured 4-6x re-execution before this
        # rewrite. (2) Filtering directly on the aggregate-derived column
        # lets Catalyst inline the whole higher-order expression into the
        # filter predicate (HOFs are CodegenFallback — interpreted, no
        # subexpression reuse), measured ~7x the cost of projecting the
        # same column; the persist boundary forces one evaluation per row
        # into the cache and the filter then reads materialized values.
        rep_scores = track(
            reps.select(id_col, "dup_gram_frac")
            .persist(StorageLevel.MEMORY_AND_DISK))
        bad = rep_scores.filter(
            F.col("dup_gram_frac") > max_dup_gram_frac).select(id_col)
        cur = cur.join(bad, id_col, "left_anti")
    if boilerplate_min_df > 0 or dedup_paragraphs:
        # Fused line section. Running drop_boilerplate_lines and
        # dedup_lines_keep_first SEQUENTIALLY (each with its own explode,
        # dim join and array rebuild) re-tokenizes and re-rebuilds the whole
        # corpus once per stage; instead both verdict dims are derived from
        # ONE persisted (id, pos, line) exploded frame and both drop sets
        # are applied by POSITION in ONE order-preserving array filter.
        # The fusion is order-safe: an order-preserving filter keeps
        # relative order within each doc, so argmin(id, original_pos) picks
        # the same keep-first occurrence as argmin(id, post-filter pos) —
        # id dominates the struct order and pos only breaks ties inside one
        # document. NOTE the fused pass is deliberately NOT output-identical
        # to the standalone ops: blank lines are exempt from both the
        # boilerplate df aggregation and the keep-first winner computation
        # (kept unconditionally — paragraph SEPARATORS, not paragraphs;
        # see the module docstring), an exemption the standalone
        # drop_boilerplate_lines / dedup_lines_keep_first do not apply.
        # test_curate.py pins equivalence on blank-free corpora and the
        # blank-line exemption on corpora with them.
        raw_lines = F.split(
            F.coalesce(F.col(text_col), F.lit("")), "\n")
        if line_mode == "newline":
            lines_src = cur.select(F.col(id_col), raw_lines.alias("lines"))
        elif line_mode == "auto":
            # Per-doc unit pick. The token array is materialized into a
            # column first (with_chunk_lines' O(len^2) guard); CaseWhen
            # evaluates only the taken branch per row, so newline docs
            # never pay the chunking transform.
            from .repetition import chunk_lines_expr, tokens_expr

            lines_src = cur.withColumn(
                "_toks", tokens_expr(text_col)
            ).select(
                F.col(id_col),
                F.when(
                    F.coalesce(F.col(text_col), F.lit("")).contains("\n"),
                    raw_lines,
                ).otherwise(
                    chunk_lines_expr(F.col("_toks"), tokens_per_line)
                ).alias("lines"))
        else:
            lines_src = with_chunk_lines(
                cur, tokens_per_line, text_col=text_col).select(
                    id_col, "lines")
        # Tokenization/chunking runs exactly once into this cache; the
        # rebuild reads the arrays back instead of recomputing them.
        lines_src = track(lines_src.persist(StorageLevel.MEMORY_AND_DISK))
        # Blank-line exemption: whitespace-only lines are layout, not
        # dedupable values — they feed neither verdict dim, so their
        # positions never enter the drop sets and the rebuild keeps them
        # unconditionally. (Chunk pseudo-lines are never blank.)
        light = track(
            lines_src.select(
                F.col(id_col), F.posexplode("lines").alias("pos", "line"))
            .filter(F.col("line").rlike(r"\S"))
            .persist(StorageLevel.MEMORY_AND_DISK))

        # Both stages drop by POSITION: boilerplate removes every
        # occurrence of a frequent line, and the exploded frame already
        # knows every occurrence's position, so collecting hit positions
        # (ints, bounded by the doc's own line count) replaces the former
        # per-line array_contains scan over a per-doc string array —
        # O(lines x distinct_bad_lines) per document for template-heavy
        # docs — with one merged int-set membership test.
        bad_pos_per_doc = None
        drops_per_doc = None
        surv = light
        if boilerplate_min_df > 0:
            # Same dim as drop_boilerplate_lines: distinct-doc frequency,
            # count-only shuffle state, NOT hint-broadcast (unbounded at web
            # scale — AQE decides). Persisted: it feeds the keep-first
            # anti-join AND the per-doc hit positions.
            boiler = track(
                light.select(id_col, "line").distinct()
                .groupBy("line").agg(F.count(F.lit(1)).alias("df"))
                .filter(F.col("df") >= boilerplate_min_df).select("line")
                .persist(StorageLevel.MEMORY_AND_DISK))
            surv = light.join(boiler, "line", "left_anti")
            bad_pos_per_doc = (
                light.join(boiler, "line", "inner")
                .groupBy(id_col)
                .agg(F.collect_set("pos").alias("_badpos")))
        if dedup_paragraphs:
            # Same winner rule as dedup_lines_keep_first: minimal (id, pos)
            # occurrence of each duplicated boilerplate-surviving line.
            winners = (
                surv.groupBy("line")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.min(F.struct(F.col(id_col).alias("id"),
                                    F.col("pos").alias("pos")))
                     .alias("first"))
                .filter(F.col("n") >= 2)
                .select("line", "first"))
            drops_per_doc = (
                surv.join(winners, "line", "inner")
                .filter(~((F.col(id_col) == F.col("first.id"))
                          & (F.col("pos") == F.col("first.pos"))))
                .groupBy(id_col)
                .agg(F.collect_set("pos").alias("_drop")))

        rebuilt = lines_src
        if bad_pos_per_doc is not None:
            rebuilt = rebuilt.join(bad_pos_per_doc, id_col, "left")
        else:
            rebuilt = rebuilt.withColumn(
                "_badpos", F.lit(None).cast("array<int>"))
        if drops_per_doc is not None:
            rebuilt = rebuilt.join(drops_per_doc, id_col, "left")
        else:
            rebuilt = rebuilt.withColumn(
                "_drop", F.lit(None).cast("array<int>"))
        drop_all = F.when(
            F.col("_badpos").isNull(), F.coalesce(
                F.col("_drop"), F.array().cast("array<int>"))
        ).when(
            F.col("_drop").isNull(), F.col("_badpos")
        ).otherwise(F.array_union(F.col("_badpos"), F.col("_drop")))
        kept = F.when(
            F.col("_badpos").isNull() & F.col("_drop").isNull(),
            F.col("lines"),
        ).otherwise(
            F.filter(F.col("lines"),
                     lambda _ln, i: ~F.array_contains(F.col("_dropall"), i)))
        rebuilt = rebuilt.withColumn("_dropall", drop_all).select(
            F.col(id_col), F.concat_ws("\n", kept).alias(text_col))
        cur = cur.drop(text_col).join(rebuilt, id_col)
    if redact:
        cur = redact_pii(cur, text_col=text_col, out_col=text_col)
    if drop_empty:
        # after redaction: placeholders are non-blank, so this keys on the
        # final bytes either way; null text is dropped too (rlike -> null)
        cur = cur.filter(F.col(text_col).rlike(r"\S"))
    # preserve the caller's column order (joins append the rebuilt text)
    return cur.select(*pages.columns)
