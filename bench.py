"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "docs_per_sec": ..., ...}

The flagship number is extraction throughput (docs/sec) over the pages
table synthesized at the benchmark scale — the BASELINE.json metric.
Run with SPARK_GRAFT_CPUS=8 and =32 for the N-vs-4N scaling-efficiency
evidence (recorded in BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ocr_spark.contract import QUERIES  # noqa: E402
from ocr_spark.operators.extract import extract_pages  # noqa: E402
from ocr_spark.plans.session import get_spark  # noqa: E402
from ocr_spark.sources.pages import pages_df  # noqa: E402

BENCH_QUERIES = [
    "pdf_extract",
    "markdown_export",
    "dedup_exact",
    "jaccard_pairs",
    "winnow_pairs",
    "incremental_dedup",
    "sa_dups",
    "containment",
    "jaccard_cjk",
    "nb_classifier",
    "script_mix",
    "url_templates",
    "minhash_pairs",
    "simhash_pairs",
    "image_dups",
    "audio_dups",
    "video_dups",
    "cdc_chunks",
    "ann_topk",
    "lsh_ann",
    "ivf_ann",
    "pq_ann",
    "kmeans",
    "embed_centroids",
    "revenue_topk",
    "cube_agg",
    "events_hourly",
    "window_topk",
    "ctc_roundtrip",
    "crnn_read",
    "combine_boxes",
    "training_pipeline",
    "langid",
    "ct_langid",
    "quality",
    "repetition",
    "readability",
    "blocklist",
    "bpe_tokens",
    "unigram_segment",
    "url_canon",
    "line_dedup",
    "host_templates",
    "charset_sniff",
    "mojibake",
    "c4_clean",
    "pii_redact",
    "ngram_spans",
    "hash_embed",
    "bigram_lm",
    "ngram_lm",
    "dup_spans",
    "decontaminate",
    "stratified_sample",
    "shuffle_shards",
    "url_latest",
    "redirects",
    "snapshot_drift",
    "page_meta",
    "mirror_hosts",
    "surt",
    "mirror_clusters",
    "url_changes",
    "token_budget",
    "page_links",
    "link_hosts",
    "pagerank",
    "trustrank",
    "seed_distance",
    "hits",
    "reciprocity",
    "bm25_topk",
    "asof_join",
    "semdedup",
    "quality_classifier",
    "sequence_pack",
    "robots_filter",
    "politeness",
    "dsir",
    "dsir_resample",
    "audio_features",
    "meta_robots",
    "video_frames",
    "domain_split",
    "domain_prior",
    "unimax",
    "vtt_cues",
    "bloom_prefilter",
    "bitext",
    "bitext_align",
    "ccnet_buckets",
    "refresh_schedule",
    "feed_entries",
    "og_meta",
    "http_headers",
    "frontier_plan",
    "anchor_summary",
    "gopher_rules",
    "dedup_keep_best",
    "heavy_hitters",
    "hll_distinct",
    "length_quantiles",
    "sitemap_gap",
    "host_communities",
    "phrase_topk",
    "jsonld_entities",
    "microdata",
    "crawl_overlap",
    "wordpiece",
    "css_select",
    "snapshot_diff",
    "hyperball",
    "triangles",
    "zorder",
    "homograph",
    "kcore",
    "textrank",
    "walks",
    "ip_asn",
    "profile",
    "annotate_meta",
    "phash_dups",
    "lr_trained",
    "text_tiles",
    "kn_lm",
    "alpha_mix",
    "soft404_html",
    "line_langid",
    # round 4: persisted vector-index artifact + code-space semantic dedup
    "ann_index_build",
    "ann_index_query",
    "ann_index_ivf_query",
    "semdedup_pq",
    # round 5: zero-collect batch probe, container metadata, spectral
    # fingerprint, two-font trained CRNN
    "ann_index_batch_query",
    "video_meta",
    "audio_spectral",
    "crnn_multifont",
    "audio_gate",
    "srt_align",
    "audio_mel",
]


#: best-of-N single-thread 10M-add loop time on THIS box when idle
#: (measured 2026-08-21, load < 1 between Spark runs). The per-run
#: calibration below is compared against this to annotate anti-scaling
#: flags: a window whose calibration deviates > 20% from idle was
#: co-tenant-loaded, and its flags are drift suspects, not structure
#: (BENCH/BASELINE.md round-3 "box noise" methodology).
IDLE_CALIBRATION_SEC = 0.35


def hw_calibration(reps: int = 3) -> float:
    """Pure-python single-thread probe of the box's CURRENT speed — the
    same burn loop scripts/scaling.py uses for its hardware ceiling."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        s = 0
        for i in range(10_000_000):
            s += i
        best = min(best, time.time() - t0)
    return round(best, 4)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    # probe the host BEFORE the query loop too: a co-tenant burst that
    # subsides before a single end-of-run probe would otherwise stamp a
    # loaded window as clean (the round-3 2-3x swing methodology)
    hw_before = hw_calibration()

    spark = get_spark("ocr_spark_bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/Arrow warmup (not timed)
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}

    # headline: flagship extraction throughput over a pages table read from
    # parquet — the production data path (scan -> single mapInPandas ->
    # sink). The corpus is replicated to a fixed size so the measurement is
    # CPU-bound and identical at every cpu count (the N-vs-4N comparison).
    # The synthesized pages parquet is materialized once and reused
    # (measured separately as pages_synth); chaining the synthesis python
    # stage into the extraction would serialize the pipeline — see
    # BENCH/BASELINE.md "chained mapInPandas" note.
    bench_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "40000"))
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    replicate = max(1, bench_docs // base)
    pages_path = f"/tmp/ocr_spark_bench/pages_sf{sf}_n{base * replicate}"
    if not os.path.exists(pages_path + "/_SUCCESS"):
        t0 = time.time()
        pages_df(spark, sf_dir, replicate=replicate, partitions=cpus * 3).write.mode(
            "overwrite"
        ).parquet(pages_path)
        timings["pages_synth"] = round(time.time() - t0, 3)
    pages = spark.read.parquet(pages_path)
    n_docs = pages.count()  # warm the scan metadata
    # full warm pass spins up ALL python workers; its count doubles as n_out
    n_out = extract_pages(pages).count()

    def timed(fn):
        # best-of-2: wall timings on a shared box are noisy; min is the
        # closest to the true cost
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
            # drop orphaned persist() blocks: every call builds NEW
            # DataFrames, so a previous call's cache is never reused and
            # only accumulates in executor storage memory. A fresh-vs-
            # dirty-session A/B showed no measurable bleed into later
            # queries at sf0.1 (suite-context inflation turned out to be
            # co-tenant bursts), so this is hygiene, not a speedup.
            spark.catalog.clearCache()
        return round(best, 3)

    timings["flagship_extract"] = timed(lambda: extract_pages(pages).count())
    t_extract = timings["flagship_extract"]

    # the r01-comparable number: pages minus the real-image docs (5% of the
    # corpus runs REAL pixel OCR at ~5 ms/doc single-thread — decode +
    # projection-profile detect + template recognize; the text-only slice
    # isolates the markup-extraction throughput)
    text_pages = pages.where(
        "NOT (substring(html,1,4) = X'89504E47' OR substring(html,1,2) = X'FFD8')"
    )
    n_text = text_pages.count()
    timings["flagship_extract_text_only"] = timed(
        lambda: extract_pages(text_pages).count()
    )

    # beam decoder variant (VERDICT r01 item 9 target: within 3x of greedy)
    timings["flagship_extract_beam"] = timed(
        lambda: extract_pages(pages, decode_method="beam").count()
    )

    # the full crawl edge: WARC container files -> pages -> extraction
    # (one-time WARC materialization of the same corpus, 32 files)
    warc_dir = f"/tmp/ocr_spark_bench/warc_sf{sf}_n{n_docs}"
    if not os.path.exists(warc_dir + "/_DONE"):
        from ocr_spark.sources.warc import write_warc

        os.makedirs(warc_dir, exist_ok=True)
        rows = pages.select("url", "warc_ts", "html").collect()
        shard = max(1, len(rows) // 32)
        for i in range(0, len(rows), shard):
            blob = write_warc([(r.url, r.warc_ts, bytes(r.html)) for r in rows[i : i + shard]])
            with open(f"{warc_dir}/crawl-{i // shard:05d}.warc.gz", "wb") as f:
                f.write(blob)
        open(warc_dir + "/_DONE", "w").close()
    from ocr_spark.sources.warc import read_warc_pages

    timings["warc_ingest_extract"] = timed(
        lambda: extract_pages(read_warc_pages(spark, warc_dir + "/*.warc.gz")).count()
    )

    # extraction + parquet write (the full scan -> extract -> sink job)
    timings["flagship_extract_write"] = timed(
        lambda: extract_pages(pages).write.mode("overwrite").parquet("/tmp/ocr_spark_bench/out")
    )

    for name in BENCH_QUERIES:
        timings[name] = timed(lambda: QUERIES[name](spark, sf_dir).count())

    total = round(sum(v for k, v in timings.items() if k != "pages_synth"), 3)
    result = {
        "metric": "extraction+ops wall time (flagship docs/sec in docs_per_sec)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "n_docs": n_docs,
        "n_extracted": n_out,
        "docs_per_sec": round(n_out / t_extract, 1) if t_extract else None,
        # same-window tenancy probes, before and after the query loop
        # (see IDLE_CALIBRATION_SEC); the WORST of the two stamps the
        # window
        "hw_calibration_sec": max(hw_before, hw_calibration()),
        "hw_calibration_before_sec": hw_before,
    }

    # anti-scaling gate (VERDICT r02 item 4): when SPARK_GRAFT_PAIR_JSON
    # points at a lower-cpu companion run, flag every query that got BOTH
    # slower than 1.3x the small-run time AND costs > 2 s — "more cores,
    # meaningfully slower" must never pass silently again (the r2r
    # hits/training_pipeline pair). The flags ride in the JSON so the
    # recorded BENCH_r{N} file carries its own verdict.
    pair_path = os.environ.get("SPARK_GRAFT_PAIR_JSON", "")
    if pair_path and os.path.exists(pair_path):
        with open(pair_path) as f:
            pair = json.load(f)
        # tenancy annotation (VERDICT r03 next-round #5): compare BOTH
        # windows' pure-python calibration to idle — a loaded window
        # produces drift flags that contradict the quiet interleaved
        # A/B/A (r3c: sa_dups 1.63x under load 4-6 vs 1.08x quiet), so
        # recorded flags must carry their own credibility verdict
        this_hw = result["hw_calibration_sec"]
        pair_hw = pair.get("hw_calibration_sec")
        # ADVICE r4: the boolean is ADVISORY in both directions — the
        # hardcoded idle reference is per-box, and the round-4 windows
        # showed the single-thread probe reading ~2.5x slow while Spark
        # executor threads ran at full speed. The raw calibration numbers
        # ride in the JSON; adjudication belongs to scripts/ab_pair.py.
        loaded = this_hw > 1.2 * IDLE_CALIBRATION_SEC or (
            pair_hw is not None and pair_hw > 1.2 * IDLE_CALIBRATION_SEC
        )
        flagged = []
        for name, t in timings.items():
            t0 = pair.get("queries", {}).get(name)
            if t0 and cpus > pair.get("cpus", 0) and t > 2.0 and t > 1.3 * t0:
                flagged.append(
                    {
                        "query": name,
                        f"cpus{pair['cpus']}": t0,
                        f"cpus{cpus}": t,
                        # advisory: the probe is single-thread and this
                        # box slows the foreground thread independently
                        # of the executor pool (BENCH/BASELINE.md r4)
                        "tenancy_suspect_advisory": loaded,
                    }
                )
        result["anti_scaling"] = {
            "pair": pair_path,
            "rule": "t_big > 1.3 * t_small and t_big > 2s",
            "calibration": {
                "idle_sec": IDLE_CALIBRATION_SEC,
                "this_window_sec": this_hw,
                "pair_window_sec": pair_hw,
                "window_loaded_advisory": loaded,
            },
            "note": (
                "ADVISORY ONLY: the idle reference is a per-box constant"
                " and the single-thread probe can read slow while the"
                " executor pool runs at full speed (and vice versa) —"
                " adjudicate any flag with scripts/ab_pair.py's"
                " interleaved A/B/A before treating it as structural"
            ),
            "flagged": flagged,
        }

    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
