"""One-call training-data curation pass composing the engine's corpus
filters — the user-facing analog of the reference's single `mdedup` verb
(ref cli.py:656-674's one-command pipeline), applied to web-text curation
instead of mailbox dedup.

Stage order follows the public curation-pipeline literature (Gopher / CCNet
/ Dolma): document-level repetition filter first (drop spam before paying
for corpus-wide aggregations), then corpus-level boilerplate removal, then
keep-first paragraph dedup, then PII redaction on the surviving text.

Scale notes (100 TB): every stage reuses the shuffle-discipline of its
module — repetition_stats is shuffle-free, the line ops dehydrate (only
(id, line/pos) projections shuffle), and the two text rebuild joins are
id-keyed corpus-to-corpus equi-joins (AQE-planned). The full text column
rides exactly one join per enabled line stage, never an aggregation.

Line units are selectable (``line_mode``): ``"newline"`` splits on real
``'\\n'`` — the right choice for web text, and LOSSLESS for documents that
lose no lines (split + re-join with ``'\\n'`` is an exact inverse, so case
and layout survive); ``"chunk"`` uses normalized 10-token pseudo-lines
(lowercased, whitespace-collapsed) for newline-free corpora — same
convention as the driver-contract line queries, and destructive by design
(text is rewritten in pseudo-line space).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pii import redact_pii
from .repetition import (
    dedup_lines_keep_first,
    drop_boilerplate_lines,
    repetition_stats,
    with_chunk_lines,
)


def curate_pages(
    pages: DataFrame,
    *,
    max_dup_gram_frac: float | None = None,
    boilerplate_min_df: int = 0,
    dedup_paragraphs: bool = False,
    redact: bool = False,
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
      ``"newline"`` (real ``'\\n'`` lines; lossless for untouched docs) or
      ``"chunk"`` (normalized ``tokens_per_line``-token pseudo-lines for
      newline-free corpora; rewrites text in pseudo-line space).
    """
    if line_mode not in ("chunk", "newline"):
        raise ValueError(
            f"line_mode must be 'chunk' or 'newline', got {line_mode!r}")
    cur = pages
    if max_dup_gram_frac is not None:
        reps = repetition_stats(cur, n=2, id_col=id_col, text_col=text_col)
        bad = reps.filter(
            F.col("dup_gram_frac") > max_dup_gram_frac).select(id_col)
        cur = cur.join(bad, id_col, "left_anti")
    if boilerplate_min_df > 0 or dedup_paragraphs:
        if line_mode == "newline":
            lines_df = cur.select(
                id_col,
                F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
                .alias("lines"))
        else:
            lines_df = with_chunk_lines(
                cur, tokens_per_line, text_col=text_col).select(
                    id_col, "lines")
        if boilerplate_min_df > 0:
            b = drop_boilerplate_lines(
                lines_df, boilerplate_min_df, id_col=id_col)
            lines_df = b.select(id_col, F.col("kept_lines").alias("lines"))
        if dedup_paragraphs:
            p = dedup_lines_keep_first(lines_df, id_col=id_col)
            lines_df = p.select(id_col, F.col("kept_lines").alias("lines"))
        rebuilt = lines_df.select(
            id_col, F.concat_ws("\n", "lines").alias(text_col))
        cur = cur.drop(text_col).join(rebuilt, id_col)
    if redact:
        cur = redact_pii(cur, text_col=text_col, out_col=text_col)
    # preserve the caller's column order (joins append the rebuilt text)
    return cur.select(*pages.columns)
