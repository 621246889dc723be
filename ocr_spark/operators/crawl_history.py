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


def refresh_schedule(
    df: DataFrame,
    *,
    key: str = "url",
    ts_col: str = "warc_epoch",
    min_interval: int = 3600,
    max_interval: int = 30 * 86400,
) -> DataFrame:
    """Adaptive re-crawl scheduling from the change timeline — the
    operator a crawl frontier runs after :func:`snapshot_changes`.

    Estimated change interval = observed span ``div`` number of observed
    changes (integer seconds); pages that never changed get
    ``max_interval``. The estimate clamps to [min_interval, max_interval]
    and ``next_fetch_epoch = last_epoch + interval`` — all integer
    arithmetic, byte-identical under any partitioning, and the whole
    computation shares the ONE url exchange of snapshot_changes (pure
    Column math on its output)."""
    s = snapshot_changes(df, key, ts_col)
    est = F.expr("(last_epoch - first_epoch) div greatest(n_changes, 1)")
    interval = (
        F.when(F.col("n_changes") == 0, F.lit(max_interval).cast("long"))
        .otherwise(
            F.greatest(
                F.least(est, F.lit(max_interval).cast("long")),
                F.lit(min_interval).cast("long"),
            )
        )
        .alias("fetch_interval_s")
    )
    out = s.withColumn("fetch_interval_s", interval)
    return out.withColumn(
        "next_fetch_epoch",
        (F.col("last_epoch") + F.col("fetch_interval_s")).cast("long"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "url",
    ts_col: str = "ts",
    payload_cols: tuple[str, ...] = ("value",),
    prefix: str = "asof_",
) -> DataFrame:
    """As-of join: attach to each left row the NEWEST right row with
    ``right.ts <= left.ts`` for the same key (the temporal join Spark has
    no built-in for; DuckDB spells it ``ASOF JOIN``, kdb ``aj``).

    Scale shape — union + running last_value, NOT a range join: both sides
    are tagged and unioned, then one window per key ordered by
    (ts, side, payload) carries the most recent right payload forward onto
    each left row.  Exactly ONE hash exchange on the key; per-key state is
    the window sort only.  A range-join formulation (left ⋈ right ON key
    AND r.ts <= l.ts, then max) explodes to O(|L|·|R|) per key before
    aggregation — this stays O(|L|+|R|).

    Determinism with duplicate right timestamps: the window sort ends with
    the payload struct, so among right rows sharing (key, ts) the GREATEST
    payload is carried (DuckDB's ASOF picks an arbitrary duplicate — the
    oracle pre-aggregates max(payload) per (key, ts) to pin the same
    winner; here the tie-break folds into the one window sort instead of
    costing a separate groupBy exchange).

    Left rows with no prior right row keep NULL payloads (ASOF LEFT JOIN).
    Output: all left columns + ``<prefix>ts`` + ``<prefix><payload>``.
    """
    payload = list(payload_cols)
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)
    left_cols = left.columns
    l_tag = left.select(
        *left_cols,
        F.col(ts_col).alias("_ord_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rtypes[ts_col]).alias("_rts"),
        *[F.lit(None).cast(rtypes[c]).alias(f"_r_{c}") for c in payload],
    )
    r_tag = right.select(
        *[
            F.col(key) if c == key else F.lit(None).cast(ltypes[c]).alias(c)
            for c in left_cols
        ],
        F.col(ts_col).alias("_ord_ts"),
        F.lit(0).alias("_side"),
        F.col(ts_col).alias("_rts"),
        *[F.col(c).alias(f"_r_{c}") for c in payload],
    )
    # right sorts BEFORE left at equal ts (_side 0 < 1) -> inclusive <=;
    # payload struct last -> greatest duplicate wins deterministically
    w = (
        Window.partitionBy(key)
        .orderBy(
            F.asc("_ord_ts"),
            F.asc("_side"),
            F.asc(F.struct(*[f"_r_{c}" for c in payload])),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l_tag.unionByName(r_tag).withColumn(
        "_match",
        F.last(
            F.when(
                F.col("_side") == 0,
                F.struct("_rts", *[f"_r_{c}" for c in payload]),
            ),
            ignorenulls=True,
        ).over(w),
    )
    return carried.where(F.col("_side") == 1).select(
        *left_cols,
        F.col("_match._rts").alias(f"{prefix}ts"),
        *[F.col(f"_match._r_{c}").alias(f"{prefix}{c}") for c in payload],
    )


def mirror_hosts(
    snap_df: DataFrame,
    *,
    min_shared: int = 2,
    max_hosts_per_fp: int = 8,
) -> DataFrame:
    """Detect host mirrors from shared content fingerprints ->
    (host_a, host_b, shared, containment_milli), host_a < host_b.

    Mirror farms (the same corpus served under many hostnames) defeat
    url- and host-keyed dedup; pairing hosts by how many distinct content
    fingerprints they share is the standard detection pass. ``shared``
    counts distinct fingerprints seen on BOTH hosts; ``containment_milli``
    = shared * 1000 div min(|fp(a)|, |fp(b)|) — an integer, so ranking is
    byte-deterministic.

    Scale shape: (fingerprint, host) is made distinct first (map-side
    partial agg), then fingerprints are grouped ONCE; only fingerprints
    shared by 2..max_hosts_per_fp hosts expand into pairs, so the
    explosion per fingerprint is bounded by max_hosts_per_fp^2 and
    boilerplate mega-fingerprints (empty pages, error templates — the
    Zipfian head) are dropped instead of producing quadratic pairs. The
    cap is a documented recall bound: a corpus mirrored across MORE than
    max_hosts_per_fp hosts needs a higher cap, not a different algorithm.
    Host sets are sorted before pairing, so pair emission is
    order-independent."""
    # NULL fingerprints (unfetched/failed pages) must not pair hosts:
    # Spark's groupBy would put every NULL in one group while a SQL
    # equi-join drops them — filter to keep oracle parity and semantics
    hf = (
        snap_df.select("host", "fingerprint")
        .where(F.col("fingerprint").isNotNull() & F.col("host").isNotNull())
        .distinct()
        .persist()
    )
    per_host = hf.groupBy("host").agg(F.count(F.lit(1)).alias("n_fp"))
    grouped = (
        hf.groupBy("fingerprint")
        .agg(F.sort_array(F.collect_set("host")).alias("hosts"))
        .where(
            (F.size("hosts") >= 2) & (F.size("hosts") <= max_hosts_per_fp)
        )
    )
    pairs = (
        grouped.select(
            F.explode(
                F.expr(
                    "flatten(transform(hosts, (a, i) -> "
                    "transform(slice(hosts, i + 2, size(hosts)), "
                    "b -> struct(a as host_a, b as host_b))))"
                )
            ).alias("p")
        )
        .select("p.host_a", "p.host_b")
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    a_fp = per_host.select(F.col("host").alias("host_a"), F.col("n_fp").alias("n_a"))
    b_fp = per_host.select(F.col("host").alias("host_b"), F.col("n_fp").alias("n_b"))
    return (
        pairs.join(a_fp, "host_a")
        .join(b_fp, "host_b")
        .select(
            "host_a",
            "host_b",
            "shared",
            F.expr("(shared * 1000) div least(n_a, n_b)")
            .cast("long")
            .alias("containment_milli"),
        )
    )


def mirror_clusters(pairs_df: DataFrame) -> DataFrame:
    """Mirror-pair list -> mirror FARMS: (host, canonical_host), where
    canonical_host is the lexicographically smallest host reachable
    through the mirror graph. A farm serving one corpus under 20
    hostnames yields 20 rows with one canonical host — the key to fold
    per-host stats (pagerank, politeness budgets, quality priors) across
    a farm instead of crediting each alias separately.

    Reuses :func:`ocr_spark.operators.dedup.dedup_clusters` (min-label
    propagation with pointer jumping, O(log diameter) rounds) — the
    propagation is ordering-generic, so string hosts work exactly like
    long doc_ids."""
    from .dedup import dedup_clusters

    e = pairs_df.select(
        F.col("host_a").alias("doc_a"), F.col("host_b").alias("doc_b")
    )
    return dedup_clusters(e).select(
        F.col("doc_id").alias("host"),
        F.col("cluster_id").alias("canonical_host"),
    )


def snapshot_drift(snaps_df: DataFrame, *, shingle_w: int = 3) -> DataFrame:
    """Change MAGNITUDE between consecutive snapshots of a url ->
    (url, warc_epoch, drift_milli): 1000 - Jaccard_milli over distinct
    ``shingle_w``-word shingles of this vs the previous snapshot text.

    :func:`snapshot_changes` counts binary fingerprint flips; drift
    grades them — a fixed nav-timestamp rewrite scores near 0, a full
    template change near 1000 — which is what re-crawl scheduling and
    "content vs chrome" change classification actually need (Adar et al.
    2009 study changes this way). First snapshot of a url emits no row.

    Scale shape: shingle arrays are pure Column algebra (split + indexed
    transform + array_distinct, no Python); ONE url exchange carries the
    lag window; per-row state is the two snapshot shingle arrays, bounded
    by snapshot text length. Integer milli ratio via div -> byte-
    deterministic. Two empty shingle sets compare as unchanged (drift 0)."""
    words = F.expr(
        "filter(split(lower(snap_text), '[^a-z0-9]+'), x -> x <> '')"
    )
    sh = F.array_distinct(
        F.expr(
            f"filter(transform(ws, (w, i) -> case when i + {shingle_w} <= size(ws)"
            f" then array_join(slice(ws, i + 1, {shingle_w}), ' ') end),"
            " x -> x is not null)"
        )
    )
    w = Window.partitionBy("url").orderBy("warc_epoch")
    cur = snaps_df.withColumn("ws", words).withColumn("sh", sh)
    out = (
        cur.withColumn("prev", F.lag("sh").over(w))
        .where(F.col("prev").isNotNull())
        .select(
            "url",
            "warc_epoch",
            F.expr(
                "case when size(array_distinct(concat(sh, prev))) = 0 then 0"
                " else 1000 - (size(array_intersect(sh, prev)) * 1000)"
                " div size(array_distinct(concat(sh, prev))) end"
            )
            .cast("long")
            .alias("drift_milli"),
        )
    )
    return out


DIFF_SCHEMA = (
    "url string, ts_from long, ts_to long, op string, "
    "a_idx int, b_idx int, line string"
)


def snapshot_line_diff(snaps_df: DataFrame, *, lines_col: str = "lines") -> DataFrame:
    """Minimal edit script between consecutive snapshots of a url ->
    one row per edited line: (url, ts_from, ts_to, op '-'/'+', a_idx,
    b_idx, line). `-` rows carry the deleted line's index in the OLD
    snapshot (a_idx, b_idx null); `+` rows the inserted line's index in
    the NEW snapshot (b_idx, a_idx null). Unchanged snapshots and the
    first capture of a url emit nothing.

    :func:`snapshot_drift` grades change magnitude; this names the exact
    lines — what template-change forensics and news-diff tracking need.
    Exact Myers O(ND) (kernels/myers.py), canonical delete-on-tie walk,
    so the script is a pure function of the two line lists.

    Scale shape: ONE url-hash exchange carries the lag window (the same
    exchange snapshot_drift uses — per-url state is two line arrays);
    then ONE Arrow stage runs the diff per consecutive pair. No
    collect, no cross-snapshot joins."""
    w = Window.partitionBy("url").orderBy("warc_epoch")
    pairs = (
        snaps_df.select("url", "warc_epoch", F.col(lines_col).alias("_b"))
        .withColumn("_a", F.lag("_b").over(w))
        .withColumn("ts_from", F.lag("warc_epoch").over(w))
        .where(F.col("_a").isNotNull())
        .select("url", "ts_from", F.col("warc_epoch").alias("ts_to"), "_a", "_b")
    )

    def gen(batches):
        import pandas as pd

        from ..kernels.myers import myers_diff

        for pdf in batches:
            out = {k: [] for k in ("url", "ts_from", "ts_to", "op", "a_idx", "b_idx", "line")}
            for url, tf, tt, a, b in zip(
                pdf["url"], pdf["ts_from"], pdf["ts_to"], pdf["_a"], pdf["_b"]
            ):
                for op, ai, bi, line in myers_diff(list(a), list(b)):
                    out["url"].append(url)
                    out["ts_from"].append(int(tf))
                    out["ts_to"].append(int(tt))
                    out["op"].append(op)
                    out["a_idx"].append(ai)
                    out["b_idx"].append(bi)
                    out["line"].append(line)
            yield pd.DataFrame(
                out,
                columns=["url", "ts_from", "ts_to", "op", "a_idx", "b_idx", "line"],
            ).astype({"a_idx": "Int32", "b_idx": "Int32"})

    return pairs.mapInPandas(gen, schema=DIFF_SCHEMA)


def revisit_records(
    snaps_df: DataFrame,
    *,
    url_col: str = "url",
    ts_col: str = "warc_epoch",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Classify each capture as a WARC ``response`` or ``revisit``
    record (ISO 28500 / WARC 1.1 §6.7.2): a re-fetch whose payload
    digest was already stored for this url writes a revisit record
    pointing at the original capture instead of duplicating the body —
    the storage-dedup convention of real web archives (Common Crawl,
    Wayback). The classification is what a WARC-writing sink needs per
    row, and ``1 - n_revisits/n_captures`` is the archive's payload
    novelty rate.

    Appended columns: ``record_type`` ('response' for the FIRST capture
    of a (url, digest) pair in time order — ties all count as responses,
    deterministically — else 'revisit') and ``refers_to_epoch`` (the
    original capture's epoch; NULL on responses).

    Scale shape: ONE hash exchange on (url, fingerprint) for the
    min-epoch window; composes with the crawl-timeline family's url
    partitioning up to the finer key."""
    w = Window.partitionBy(url_col, fp_col)
    original = F.min(ts_col).over(w)
    is_revisit = F.col(ts_col) > original
    return snaps_df.select(
        "*",
        F.when(is_revisit, F.lit("revisit"))
        .otherwise(F.lit("response"))
        .alias("record_type"),
        F.when(is_revisit, original).alias("refers_to_epoch"),
    )
