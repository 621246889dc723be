"""Sitemap parsing and politeness scheduling — the crawl-edge pair to
:mod:`ocr_spark.operators.robots`.

- :func:`parse_sitemap` — tolerant sitemaps.org XML parser for one body:
  ``<urlset>`` entries (loc/lastmod/changefreq/priority) and
  ``<sitemapindex>`` child-sitemap entries, with the five XML named
  entities unescaped in ``loc``. Regex block scan, not a strict XML
  parser: crawl payloads are routinely truncated/malformed and a parse
  error must yield fewer rows, never a task failure (same policy as the
  WARC/HTML byte parsers).

- :func:`sitemap_entries` — Arrow-batched parse of a (host, sitemap_xml)
  table into an exploded entry table; ZERO exchanges (the plan is scan ->
  one python stage -> explode, asserted in tests/test_plan_shapes.py).

- :func:`politeness_schedule` — per-host fetch-slot assignment: every url
  gets ``slot`` (rank within its host by priority desc, then url) and
  ``fetch_offset_ms = slot * crawl_delay_ms``. ONE hash exchange on host
  (the window); the optional per-host delay table joins on the same key
  so AQE broadcasts it when small and reuses the exchange otherwise.
  Integer arithmetic end-to-end -> byte-identical schedules under any
  partitioning, and an exact DuckDB oracle.

Reference analog: the reference pipeline's throttled stream pacing
(/root/reference/models/ocr/base_ocr.py:518-669 fps/buffer control) is a
single-process rate gate; at crawl scale the same politeness intent is a
deterministic per-host schedule computed as data, not a sleep loop.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf

_URL_BLOCK_RE = re.compile(rb"<url\s*>(.*?)</url\s*>", re.DOTALL | re.IGNORECASE)
_SITEMAP_BLOCK_RE = re.compile(
    rb"<sitemap\s*>(.*?)</sitemap\s*>", re.DOTALL | re.IGNORECASE
)
_FIELD_RES = {
    name: re.compile(
        rb"<" + name.encode() + rb"\s*>\s*(.*?)\s*</" + name.encode() + rb"\s*>",
        re.DOTALL | re.IGNORECASE,
    )
    for name in ("loc", "lastmod", "changefreq", "priority")
}

_ENTITIES = (
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
)


def _unescape(s: str) -> str:
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return s


def _fields(block: bytes) -> dict[str, str | None]:
    out: dict[str, str | None] = {}
    for name, rx in _FIELD_RES.items():
        m = rx.search(block)
        out[name] = m.group(1).decode("utf-8", "replace") if m else None
    return out


def parse_sitemap(body: bytes | str) -> list[dict]:
    """One sitemap body -> entry dicts
    ``{kind, loc, lastmod, changefreq, priority_milli}``.

    kind is ``'sitemap'`` for ``<sitemapindex>`` children and ``'url'``
    for ``<urlset>`` entries. ``priority`` is kept as integer milli-units
    (round(p*1000)) so downstream comparisons are exact; absent or
    unparsable optional fields are None. Entries without ``<loc>`` are
    dropped (nothing to fetch)."""
    if isinstance(body, str):
        body = body.encode("utf-8", "replace")
    if body[:3] == b"\xef\xbb\xbf":
        body = body[3:]
    entries: list[dict] = []
    for kind, rx in (("sitemap", _SITEMAP_BLOCK_RE), ("url", _URL_BLOCK_RE)):
        for m in rx.finditer(body):
            f = _fields(m.group(1))
            if not f["loc"]:
                continue
            prio = None
            if kind == "url" and f["priority"] is not None:
                try:
                    # OverflowError: '1e400'/'inf' degrade to None, never a
                    # task failure (codec-parser policy)
                    prio = int(round(float(f["priority"]) * 1000.0))
                except (ValueError, OverflowError):
                    prio = None
            entries.append(
                {
                    "kind": kind,
                    "loc": _unescape(f["loc"]),
                    "lastmod": f["lastmod"],
                    "changefreq": f["changefreq"] if kind == "url" else None,
                    "priority_milli": prio,
                }
            )
    return entries


_ENTRY_SCHEMA = (
    "array<struct<kind:string,loc:string,lastmod:string,"
    "changefreq:string,priority_milli:int>>"
)


def sitemap_entries(
    sitemaps: DataFrame, *, body_col: str = "sitemap_xml"
) -> DataFrame:
    """(host, sitemap_xml) -> exploded
    (host, kind, loc, lastmod, changefreq, priority_milli)."""

    @pandas_udf(_ENTRY_SCHEMA)
    def parse(bodies: pd.Series) -> pd.Series:
        return pd.Series(
            [
                parse_sitemap(b if isinstance(b, (bytes, str)) else str(b))
                for b in bodies
            ]
        )

    return sitemaps.select("host", F.explode(parse(body_col)).alias("e")).select(
        "host",
        F.col("e.kind").alias("kind"),
        F.col("e.loc").alias("loc"),
        F.col("e.lastmod").alias("lastmod"),
        F.col("e.changefreq").alias("changefreq"),
        F.col("e.priority_milli").alias("priority_milli"),
    )


def politeness_schedule(
    urls: DataFrame,
    delays: DataFrame | None = None,
    *,
    host_col: str = "host",
    priority_col: str | None = None,
    order_col: str = "url",
    default_delay_ms: int = 1000,
) -> DataFrame:
    """Assign each url a per-host fetch slot and millisecond offset.

    ``slot`` = 0-based rank within the host, ordered by ``priority_col``
    descending (when given), then ``order_col`` ascending — deterministic
    under any partitioning. ``fetch_offset_ms = slot * crawl_delay_ms``
    where the delay comes from ``delays`` (host, crawl_delay_ms — e.g.
    :func:`ocr_spark.operators.robots.robots_directives`) with
    ``default_delay_ms`` for hosts with no (or null) delay row.
    """
    order = []
    if priority_col is not None:
        order.append(F.desc(priority_col))
    order.append(F.asc(order_col))
    w = Window.partitionBy(host_col).orderBy(*order)
    out = urls.withColumn("slot", F.row_number().over(w) - F.lit(1))
    if delays is not None:
        d = delays.select(
            F.col("host").alias(host_col),
            F.col("crawl_delay_ms").alias("_delay"),
        )
        out = out.join(d, on=[host_col], how="left")
    else:
        out = out.withColumn("_delay", F.lit(None).cast("long"))
    return out.withColumn(
        "fetch_offset_ms",
        (
            F.col("slot").cast("long")
            * F.coalesce(F.col("_delay"), F.lit(default_delay_ms).cast("long"))
        ).alias("fetch_offset_ms"),
    ).drop("_delay")


def frontier_plan(
    discovered: DataFrame,
    crawled: DataFrame,
    robots: DataFrame,
    *,
    agent: str = "*",
    default_delay_ms: int = 1000,
) -> DataFrame:
    """The crawl-loop composition: discovery -> cross-source dedup ->
    already-crawled anti-join -> robots gate -> politeness schedule.

    This is the crawl-side sibling of ``training_pipeline_v2``: the same
    operators the contract verifies individually (sitemap/feed discovery
    feeds ``discovered``, lineage feeds ``crawled``,
    :mod:`ocr_spark.operators.robots` gates and paces), composed into the
    ONE plan a production frontier builder runs per cycle.

    - ``discovered``: (host, path, url, src, recency_ms) candidate urls —
      the union of sitemap_entries / feed_entries / page_links output.
      The same url discovered by several channels keeps the freshest
      recency (tie -> lexicographically smallest src) — deterministic
      under any partitioning.
    - ``crawled``: (url) — urls already fetched (the lineage table);
      removed with a left_anti join (AQE broadcasts it when small).
    - ``robots``: (host, robots_txt) — evaluated TWICE on purpose:
      longest-match Allow/Disallow gate, then Crawl-delay for the
      per-host fetch-slot schedule (priority = recency desc).

    Scale shape: one url-key window (dedup), one url anti-join, one
    host-key rule join, one host window — four key exchanges total, each
    on the natural key of its step; no driver logic, no collect.
    """
    from .robots import robots_directives, robots_filter

    w = Window.partitionBy("url").orderBy(F.desc("recency_ms"), F.asc("src"))
    cand = (
        discovered.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    cand = cand.join(crawled.select("url"), "url", "left_anti")
    gated = (
        robots_filter(cand, robots, agent=agent)
        .where(F.col("allowed"))
        .drop("allowed")
    )
    return politeness_schedule(
        gated,
        robots_directives(robots, agent=agent),
        priority_col="recency_ms",
        order_col="url",
        default_delay_ms=default_delay_ms,
    )


def resolve_redirects(edges_df: DataFrame, max_hops: int = 8) -> DataFrame:
    """Resolve redirect chains to their terminal url by pointer doubling
    -> (url, final_url, n_hops, resolved).

    ``edges_df`` is (url, redirect_to) with one row per url that issues a
    redirect; urls absent from it are terminals. Semantics are EXACTLY
    "follow redirect edges one at a time, stop at a terminal or after
    ``max_hops`` steps": ``final_url`` is where you stand after
    min(dist_to_terminal, max_hops) steps, ``n_hops`` that step count,
    ``resolved`` whether a terminal was reached (cycles and over-long
    chains report False). A crawl consolidation pass needs this before
    url-keyed dedup — 3xx chains and hostname moves otherwise split one
    page's snapshots across keys.

    Scale shape: the successor function f_k(u) = (node after 2^k steps,
    steps taken, saturating at terminals) is computed on the NODE table —
    doubling composes f_k with itself via ONE equi-join per round, so
    ``max_hops`` (forced to a power of two) costs log2(max_hops) joins,
    not max_hops. Each round is localCheckpoint'ed: the composed table
    feeds both join sides, the same twice-referenced-lineage trap as
    hits_hosts. Unit-step equivalence (and hence the recursive-CTE
    oracle's semantics) holds because composition with saturation
    simulates exactly 2^k unit steps."""
    if max_hops < 1 or (max_hops & (max_hops - 1)):
        raise ValueError("max_hops must be a positive power of two")
    # a url seen with conflicting targets (e.g. across crawl snapshots)
    # keeps the smallest — dropDuplicates would keep a partition-order-
    # dependent row, breaking the bit-identity contract
    edges = (
        edges_df.select(
            F.col("url").alias("node"), F.col("redirect_to").alias("nxt")
        )
        .where(F.col("nxt").isNotNull())
        .groupBy("node")
        .agg(F.min("nxt").alias("nxt"))
        .persist()
    )
    nodes = (
        edges.select("node")
        .union(edges.select(F.col("nxt").alias("node")))
        .distinct()
    )
    # the doubling state is one row per node: bound the round shuffles by
    # that cardinality, not the session's scan-sized partitioning
    from ..plans.session import iteration_shuffle

    with iteration_shuffle(edges_df.sparkSession, nodes.count()) as it:
        edges = it.bind(edges)
        nodes = it.bind(nodes)
        # f_1: one step (or stay put at a terminal)
        f = (
            nodes.join(edges, "node", "left")
            .select(
                "node",
                F.coalesce("nxt", "node").alias("after"),
                F.when(F.col("nxt").isNotNull(), 1)
                .otherwise(0)
                .cast("long")
                .alias("steps"),
            )
            .localCheckpoint(eager=True)
        )
        rounds = max_hops.bit_length() - 1  # log2
        for _ in range(rounds):
            nxt_hop = f.select(
                F.col("node").alias("j_node"),
                F.col("after").alias("j_after"),
                F.col("steps").alias("j_steps"),
            )
            f = (
                f.join(nxt_hop, f["after"] == nxt_hop["j_node"])
                .select(
                    "node",
                    F.col("j_after").alias("after"),
                    (F.col("steps") + F.col("j_steps")).alias("steps"),
                )
                .localCheckpoint(eager=True)
            )
    out = (
        f.join(
            edges.select(F.col("node").alias("t_node")),
            f["after"] == F.col("t_node"),
            "left",
        )
        .select(
            F.col("node").alias("url"),
            F.col("after").alias("final_url"),
            F.col("steps").alias("n_hops"),
            F.col("t_node").isNull().alias("resolved"),
        )
    )
    return out
