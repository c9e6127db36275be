"""Selection strategies as window predicates + cascade fallback — pure column
algebra, one window pass, no UDF.

Re-expresses the reference's strategy registry (ref strategy.py:196-273) and
cascade semantics (ref deduplicate.py:456-509):

- each strategy is a boolean predicate over ``Window.partitionBy(cluster_key)``;
- a strategy is *effective* on a group iff it selects neither none nor all of
  it (ref deduplicate.py:465-490) and its prerequisites hold — time strategies
  need every member dated, else the reference raises ``MissingTimestamps``
  (ref deduplicate.py:227-249) and the set falls through to the next strategy;
- the first effective strategy wins; exhaustion skips the whole set, counted
  as SET_SKIPPED_TIMESTAMP when the *last* strategy failed on timestamps, else
  SET_SKIPPED_STRATEGY (skip_stat reset per iteration, ref deduplicate.py:469-479);
- 1-member groups are auto-selected and never enter the cascade
  (ref deduplicate.py:419-424).

Deliberate divergence: ``select-one`` / ``select-all-but-one`` are random in
the reference and documented as non-reproducible across --jobs
(ref docs/performance.md:95-97). Here they are ``row_number`` over a
deterministic ``orderBy(url)`` so output is identical at any parallelism —
required by the N-vs-4N scaling equivalence check.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .config import DedupConfig

# Canonical strategy ids -> inverse aliases (ref strategy.py:214-244).
ALIASES = {
    "discard-newest": "select-older",
    "discard-newer": "select-oldest",
    "discard-oldest": "select-newer",
    "discard-older": "select-newest",
    "discard-biggest": "select-smaller",
    "discard-bigger": "select-smallest",
    "discard-smallest": "select-bigger",
    "discard-smaller": "select-biggest",
    "discard-non-matching-path": "select-matching-path",
    "discard-matching-path": "select-non-matching-path",
    "discard-all-but-one": "select-one",
    "discard-one": "select-all-but-one",
}

TIME_STRATEGIES = {"select-older", "select-oldest", "select-newer", "select-newest"}
PATH_STRATEGIES = {"select-matching-path", "select-non-matching-path"}
CANONICAL = TIME_STRATEGIES | PATH_STRATEGIES | {
    "select-smaller", "select-smallest", "select-bigger", "select-biggest",
    "select-one", "select-all-but-one",
}
ALL_STRATEGY_IDS = CANONICAL | set(ALIASES)


def resolve_strategies(names: tuple[str, ...] | list[str],
                       regexp: str | None) -> list[str]:
    """Normalize names, resolve aliases, dedup by underlying function keeping
    first occurrence (ref cli.py:155-166), validate regexp prereq
    (ref cli.py:531-541)."""
    out: list[str] = []
    for raw in names:
        name = raw.strip().lower().replace("_", "-")
        if name not in ALL_STRATEGY_IDS:
            raise ValueError(f"unknown strategy: {raw!r}")
        canonical = ALIASES.get(name, name)
        if canonical in PATH_STRATEGIES and not regexp:
            raise ValueError(f"strategy {raw!r} requires a regexp")
        if canonical not in out:
            out.append(canonical)
    return out


@dataclass
class CascadeResult:
    df: DataFrame  # input columns + selected/applied_strategy/set_skip_kind
    strategies: list[str]


def _predicate(name: str, w: Window, ts: Column, size: Column, url: Column,
               rn: Column, regexp: str | None, p: Column) -> Column:
    """The window predicate for one canonical strategy (ref strategy.py:56-193).

    Every aggregate ranges over *participating* rows only (``when(p, ...)``) —
    this is how evicted/skipped rows are excluded from min/max extremes
    without splitting the DataFrame (the reference reduces the pool in place,
    ref deduplicate.py:449-453)."""
    pts, psize = F.when(p, ts), F.when(p, size)
    if name == "select-older":
        return ts < F.max(pts).over(w)
    if name == "select-oldest":
        return ts == F.min(pts).over(w)
    if name == "select-newer":
        return ts > F.min(pts).over(w)
    if name == "select-newest":
        return ts == F.max(pts).over(w)
    if name == "select-smaller":
        return size < F.max(psize).over(w)
    if name == "select-smallest":
        return size == F.min(psize).over(w)
    if name == "select-bigger":
        return size > F.min(psize).over(w)
    if name == "select-biggest":
        return size == F.max(psize).over(w)
    if name == "select-matching-path":
        return url.rlike(regexp)
    if name == "select-non-matching-path":
        return ~url.rlike(regexp)
    if name == "select-one":
        return rn == 1
    if name == "select-all-but-one":
        return rn > 1
    raise ValueError(name)


def apply_cascade(
    df: DataFrame,
    cfg: DedupConfig,
    key: str = "cluster_key",
    ts_col: str = "warc_ts",
    size_col: str = "n_bytes",
    url_col: str = "url",
    participates: Column | None = None,
) -> DataFrame:
    """Annotate each row with the cascade outcome.

    Adds columns:
      - ``selected``         bool (null when the whole set was skipped or the
                             row does not participate)
      - ``applied_strategy`` string ('single' for singletons, else the winning
                             strategy id, null when skipped)
      - ``set_skip_kind``    'timestamp' | 'strategy' | null

    ``participates`` gates which rows form the pool (evicted / guard-skipped /
    rejected rows are excluded by column algebra rather than by splitting the
    frame — keeps the plan linear, upstream computed once).

    One logical window pass: every per-strategy aggregate shares the same
    partition spec, so Catalyst collapses them into a single Window exec (plus
    one ordered window for the deterministic row_number) — no shuffle beyond
    the one hash-partition by ``key``.
    """
    strategies = resolve_strategies(cfg.strategies, cfg.regexp)
    p = participates if participates is not None else F.lit(True)

    w = Window.partitionBy(key)
    # Participants first, then url: participants get row_number 1..n.
    wo = Window.partitionBy(key).orderBy(F.when(p, 0).otherwise(1), url_col)
    ts, size, url = F.col(ts_col), F.col(size_col), F.col(url_col)
    n = F.sum(p.cast("int")).over(w)
    n_dated = F.sum((p & ts.isNotNull()).cast("int")).over(w)
    all_dated = n_dated == n
    rn = F.row_number().over(wo)

    preds: list[Column] = []
    effectives: list[Column] = []
    ts_failed: list[Column] = []  # strategy k failed due to MissingTimestamps
    for name in strategies:
        pred = p & _predicate(name, w, ts, size, url, rn, cfg.regexp, p)
        needs_ts = name in TIME_STRATEGIES
        if needs_ts:
            # Undated member => MissingTimestamps => strategy inapplicable.
            pred_gated = F.when(all_dated, pred).otherwise(F.lit(False))
            ts_fail = ~all_dated
        else:
            pred_gated = pred
            ts_fail = F.lit(False)
        sel_cnt = F.sum(pred_gated.cast("int")).over(w)
        effective = ~ts_fail & (sel_cnt > 0) & (sel_cnt < n)
        preds.append(pred_gated)
        effectives.append(effective)
        ts_failed.append(ts_fail)

    # First effective strategy wins (ref deduplicate.py:465-490).
    selected = F.when(~p, F.lit(None).cast("boolean")).when(n == 1, F.lit(True))
    applied = F.when(~p, F.lit(None).cast("string")).when(n == 1, F.lit("single"))
    for name, pred, eff in zip(strategies, preds, effectives):
        selected = selected.when(eff, pred)
        applied = applied.when(eff, F.lit(name))
    any_effective = F.lit(False)
    for eff in effectives:
        any_effective = any_effective | eff
    # Exhausted cascade: skip kind from the LAST strategy's failure mode
    # (ref deduplicate.py:469-479 resets skip_stat each iteration).
    if strategies:
        last_ts_fail = ts_failed[-1]
        skip_kind = F.when(
            p & (n > 1) & ~any_effective,
            F.when(last_ts_fail, F.lit("timestamp")).otherwise(F.lit("strategy")),
        )
    else:
        # No strategy at all: every multi-row set is skipped
        # (ref deduplicate.py:457-458).
        skip_kind = F.when(p & (n > 1), F.lit("strategy"))

    return (
        df.withColumn("selected", selected)
        .withColumn("applied_strategy", applied)
        .withColumn("set_skip_kind", skip_kind)
    )
