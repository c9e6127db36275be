"""Run statistics + invariant checks.

Ports the reference's ``Stat`` metric set (ref deduplicate.py:66-134) and the
``check_stats`` consistency identities (ref deduplicate.py:1319-1398) verbatim
— the pipeline's self-check. Metrics are computed as one aggregation over the
final annotated DataFrame (two-phase hash agg, partial map-side combine), not
driver-side counters.

Row status lifecycle (mirrors the reference's accounting):

  found    = every input row
  rejected = unparsable / below min-text floor       (ref deduplicate.py:1001-1007)
  retained = found - rejected
  unique   = member of a 1-row set                   (ref deduplicate.py:419-424)
  skipped  = evicted by guards OR member of a skipped set
             (ref deduplicate.py:449-453, skip_set deduplicate.py:404-408)
  selected / discarded = cascade outcome on surviving multi-row sets

Set outcomes: single, deduplicated, skipped_size, skipped_content,
skipped_timestamp, skipped_strategy (skipped_encoding is structurally 0 here:
web text arrives decoded; kept for parity).
"""

from __future__ import annotations

import enum

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Stat(enum.Enum):
    # Mail-level (here: document-level) — ref deduplicate.py:73-105.
    MAIL_FOUND = "found"
    MAIL_REJECTED = "rejected"
    MAIL_RETAINED = "retained"
    MAIL_HASHES = "hashes"
    MAIL_UNIQUE = "unique"
    MAIL_DUPLICATES = "duplicates"
    MAIL_SKIPPED = "skipped"
    MAIL_DISCARDED = "discarded"
    MAIL_SELECTED = "selected"
    MAIL_COPIED = "copied"
    MAIL_MOVED = "moved"
    MAIL_DELETED = "deleted"
    # Set-level — ref deduplicate.py:106-133.
    SET_TOTAL = "set_total"
    SET_SINGLE = "set_single"
    SET_SKIPPED_ENCODING = "set_skipped_encoding"
    SET_SKIPPED_SIZE = "set_skipped_size"
    SET_SKIPPED_CONTENT = "set_skipped_content"
    SET_SKIPPED_TIMESTAMP = "set_skipped_timestamp"
    SET_SKIPPED_STRATEGY = "set_skipped_strategy"
    SET_DEDUPLICATED = "set_deduplicated"

    @property
    def category(self) -> str:
        return self.name.partition("_")[0].lower()


class StatsInconsistency(AssertionError):
    """Raised when an invariant fails (the reference exits 115,
    ref deduplicate.py:1282-1317)."""


def compute_stats(final_df: DataFrame) -> dict[Stat, int]:
    """One aggregation pass over the final annotated frame.

    Expects columns: rejected(bool), status(string one of
    rejected|unique|selected|discarded|skipped), set_outcome(string, only
    meaningful on one designated row per set via ``set_rep`` bool).
    """
    c = F.count(F.lit(1))

    def n(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0))

    row = final_df.agg(
        c.alias("found"),
        n(F.col("status") == "rejected").alias("rejected"),
        n(F.col("status") != "rejected").alias("retained"),
        n(F.col("status") == "unique").alias("unique"),
        n(F.col("status") == "skipped").alias("skipped"),
        n(F.col("status") == "selected").alias("selected"),
        n(F.col("status") == "discarded").alias("discarded"),
        n(F.col("set_rep")).alias("set_total"),
        n(F.col("set_rep") & (F.col("set_outcome") == "single")).alias("set_single"),
        n(F.col("set_rep") & (F.col("set_outcome") == "skipped_size")).alias("set_skipped_size"),
        n(F.col("set_rep") & (F.col("set_outcome") == "skipped_content")).alias("set_skipped_content"),
        n(F.col("set_rep") & (F.col("set_outcome") == "skipped_timestamp")).alias("set_skipped_timestamp"),
        n(F.col("set_rep") & (F.col("set_outcome") == "skipped_strategy")).alias("set_skipped_strategy"),
        n(F.col("set_rep") & (F.col("set_outcome") == "deduplicated")).alias("set_deduplicated"),
    ).collect()[0]
    # sum() over zero rows yields NULL — read every metric as 0 then.
    row = {k: (0 if v is None else v) for k, v in row.asDict().items()}

    stats = {s: 0 for s in Stat}
    stats[Stat.MAIL_FOUND] = row["found"]
    stats[Stat.MAIL_REJECTED] = row["rejected"]
    stats[Stat.MAIL_RETAINED] = row["retained"]
    stats[Stat.MAIL_HASHES] = row["set_total"]
    stats[Stat.MAIL_UNIQUE] = row["unique"]
    stats[Stat.MAIL_DUPLICATES] = row["retained"] - row["unique"]
    stats[Stat.MAIL_SKIPPED] = row["skipped"]
    stats[Stat.MAIL_SELECTED] = row["selected"]
    stats[Stat.MAIL_DISCARDED] = row["discarded"]
    stats[Stat.SET_TOTAL] = row["set_total"]
    stats[Stat.SET_SINGLE] = row["set_single"]
    stats[Stat.SET_SKIPPED_SIZE] = row["set_skipped_size"]
    stats[Stat.SET_SKIPPED_CONTENT] = row["set_skipped_content"]
    stats[Stat.SET_SKIPPED_TIMESTAMP] = row["set_skipped_timestamp"]
    stats[Stat.SET_SKIPPED_STRATEGY] = row["set_skipped_strategy"]
    stats[Stat.SET_DEDUPLICATED] = row["set_deduplicated"]
    return stats


def _assert(stats: dict[Stat, int], first, op: str, second) -> None:
    """Ref ``assert_stats`` (deduplicate.py:1282-1317)."""

    def val(x):
        if isinstance(x, tuple):
            return sum(stats[s] for s in x), " + ".join(s.name.lower() for s in x)
        return stats[x], x.name.lower()

    v1, n1 = val(first)
    v2, n2 = val(second)
    ok = v1 >= v2 if op == ">=" else v1 == v2
    if not ok:
        raise StatsInconsistency(f"EXPECTED: {n1} {op} {n2} — got {v1} {op} {v2}")


def check_stats(stats: dict[Stat, int], action: str | None = None) -> None:
    """The reference's 15 identities, ported verbatim
    (ref deduplicate.py:1319-1398)."""
    S = Stat
    _assert(stats, S.MAIL_FOUND, ">=", S.MAIL_REJECTED)
    _assert(stats, S.MAIL_FOUND, ">=", S.MAIL_RETAINED)
    _assert(stats, S.MAIL_FOUND, "==", (S.MAIL_REJECTED, S.MAIL_RETAINED))

    _assert(stats, S.MAIL_RETAINED, ">=", S.MAIL_UNIQUE)
    _assert(stats, S.MAIL_RETAINED, ">=", S.MAIL_DUPLICATES)
    _assert(stats, S.MAIL_RETAINED, "==", (S.MAIL_UNIQUE, S.MAIL_DUPLICATES))

    _assert(stats, S.MAIL_RETAINED, ">=", S.MAIL_SKIPPED)
    _assert(stats, S.MAIL_RETAINED, ">=", S.MAIL_DISCARDED)
    _assert(stats, S.MAIL_RETAINED, ">=", S.MAIL_SELECTED)
    _assert(stats, S.MAIL_RETAINED, "==",
            (S.MAIL_UNIQUE, S.MAIL_SKIPPED, S.MAIL_DISCARDED, S.MAIL_SELECTED))

    if action in ("copy-selected", "copy-discarded"):
        tgt = S.MAIL_COPIED
    elif action in ("move-selected", "move-discarded"):
        tgt = S.MAIL_MOVED
    elif action in ("delete-selected", "delete-discarded"):
        tgt = S.MAIL_DELETED
    else:
        tgt = None
    if tgt is not None and action is not None:
        if action.endswith("-discarded"):
            _assert(stats, S.MAIL_DISCARDED, "==", tgt)
        else:
            _assert(stats, (S.MAIL_UNIQUE, S.MAIL_SELECTED), "==", tgt)

    _assert(stats, S.SET_TOTAL, "==", S.MAIL_HASHES)
    _assert(stats, S.SET_SINGLE, "==", S.MAIL_UNIQUE)
    _assert(stats, S.SET_TOTAL, "==",
            (S.SET_SINGLE, S.SET_SKIPPED_ENCODING, S.SET_SKIPPED_SIZE,
             S.SET_SKIPPED_CONTENT, S.SET_SKIPPED_TIMESTAMP,
             S.SET_SKIPPED_STRATEGY, S.SET_DEDUPLICATED))
