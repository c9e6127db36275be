"""Row sinks: the reference's action verbs over parquet tables.

Ref action.py routes a verb over the selected or discarded subset
(ref action.py:312-339). Table-scale mapping (SURVEY.md §2.1):

- copy-*   : write the subset to a new table          (ref copy_mails action.py:75-92)
- move-*   : copy + delete from source                (ref move_mails action.py:94-117)
- delete-* : rewrite the source without the subset    (ref delete_mails action.py:120-136)
- hardlink : no FS analog at table scale -> **pointer dedup**: keep one text
             per cluster, rewrite duplicates as (url -> kept_url) reference
             rows (ref hardlink_mails action.py:215-265)
- dry-run  : compute everything, write nothing        (ref action.py:66-72)

Writers return the row count they acted on so stats accounting can assert
MAIL_COPIED/MOVED/DELETED identities (ref deduplicate.py:1369-1390).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .pipeline import discarded, selection

PAGE_COLS = ["url", "warc_ts", "html", "text", "lang"]

ACTIONS = (
    "copy-selected", "copy-discarded",
    "move-selected", "move-discarded",
    "delete-selected", "delete-discarded",
    "hardlink-discarded",
)


def _subset(final: DataFrame, action: str) -> DataFrame:
    if action.endswith("-discarded"):
        return discarded(final)
    return selection(final)


def perform(final: DataFrame, action: str, out_path: str | None = None,
            dry_run: bool = False, pages: DataFrame | None = None) -> dict:
    """Route an action verb (ref action.py:312-339). Returns counts.

    The pipeline dehydrates the payload column (html) from its working set;
    pass the source ``pages`` frame to re-hydrate written rows by url
    (ref hydrate, mail.py:264-294). Without it, the payload column is omitted.
    """
    if action not in ACTIONS:
        raise ValueError(f"unknown action: {action!r}")
    target = _subset(final, action)
    count = target.count()
    verb = action.split("-")[0]

    if dry_run:
        return {"action": action, "count": count, "written": False}

    def hydrate(df: DataFrame) -> DataFrame:
        if "html" not in df.columns and pages is not None:
            df = df.join(pages.select("url", "html"), "url", "left")
        cols = [c for c in PAGE_COLS if c in df.columns]
        return df.select(*cols)

    if verb in ("copy", "move"):
        if not out_path:
            raise ValueError(f"{action} requires out_path")
        hydrate(target).write.mode("overwrite").parquet(out_path)
        written = True
        if verb == "move":
            # Table-side delete is the caller's rewrite of the source (we
            # never mutate the input path in place — snapshot semantics).
            pass
    elif verb == "delete":
        if not out_path:
            raise ValueError(f"{action} requires out_path (the rewritten table)")
        keep = final.join(target.select("url"), "url", "left_anti")
        hydrate(keep).write.mode("overwrite").parquet(out_path)
        written = True
    elif verb == "hardlink":
        if not out_path:
            raise ValueError(f"{action} requires out_path")
        pointer_dedup(final).write.mode("overwrite").parquet(out_path)
        written = True
    return {"action": action, "count": count, "written": written}


def pointer_dedup(final: DataFrame) -> DataFrame:
    """(url, kept_url, is_canonical): each discarded row points at the
    deterministic min-url kept row of its set — the table analog of replacing
    a file with a hardlink to the kept copy (link target = min kept mail,
    ref deduplicate.py:1140-1170, min at :1168). Window-only, no join."""
    w = Window.partitionBy("cluster_key")
    kept_min = F.min(
        F.when(F.col("status").isin("unique", "selected"), F.col("url"))
    ).over(w)
    return (
        final.filter(F.col("status").isin("unique", "selected", "discarded"))
        .withColumn("kept_url", F.coalesce(kept_min, F.col("url")))
        .withColumn("is_canonical", F.col("url") == F.col("kept_url"))
        .select("url", "kept_url", "is_canonical")
    )
