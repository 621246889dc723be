"""Crawl-history operators over multi-snapshot page tables.

A real crawl corpus holds MANY snapshots of each url (monthly Common-Crawl
style). Two first-class operations on (url, warc_epoch, fingerprint):

- :func:`latest_snapshot` — keep the newest snapshot per url (the dedup
  pass every cross-crawl corpus build starts with).
- :func:`snapshot_changes` — per-url change statistics: snapshot count,
  number of content changes (fingerprint != previous fingerprint in
  time order), and the first/last capture epochs. Feeds refresh-rate
  scheduling and "page is static boilerplate" signals.

Scale notes: both operators are a SINGLE hash exchange on url. In
snapshot_changes the lag window and the final aggregation share the url
partitioning, so Catalyst plans one Exchange reused by both (asserted in
tests/test_crawl_history.py). Per-url state is O(snapshots-per-url) only
inside the window sort — no global sort, no driver involvement. url is
also the flagship job's partition key, so at 100 TB these compose with the
extraction output without a new shuffle.

Reference analog: the predicted-cache skip logic
(/root/reference/models/ocr/base_ocr.py:236-276) keys work off the newest
state per input; here the key is the crawl timeline per url.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def latest_snapshot(
    df: DataFrame, key: str = "url", ts_col: str = "warc_epoch"
) -> DataFrame:
    """Newest row per key. row_number over (key, ts desc); deterministic
    tie-break on fingerprint so replayed inputs reproduce byte-identically
    even with duplicate capture times."""
    w = Window.partitionBy(key).orderBy(
        F.desc(ts_col), F.asc("fingerprint")
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def snapshot_changes(
    df: DataFrame, key: str = "url", ts_col: str = "warc_epoch"
) -> DataFrame:
    """Per-url crawl-timeline stats: n_snapshots, n_changes (content
    fingerprint differs from the previous snapshot), first/last epoch.
    The first snapshot is not a change."""
    w = Window.partitionBy(key).orderBy(F.asc(ts_col), F.asc("fingerprint"))
    lagged = df.withColumn("_prev", F.lag("fingerprint").over(w))
    return lagged.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n_snapshots"),
        F.sum(
            F.when(
                F.col("_prev").isNotNull() & (F.col("_prev") != F.col("fingerprint")), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_changes"),
        F.min(ts_col).cast("long").alias("first_epoch"),
        F.max(ts_col).cast("long").alias("last_epoch"),
    )
