"""CDXJ index export: round-trip identity, global sort order across
shards, disjoint manifest ranges, digest/length correctness, NaT fallback."""

import hashlib

import pytest

from ocr_spark.sources.cdx import export_cdxj, read_cdxj
from ocr_spark.sources.pages import pages_df

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def cdx_export(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cdx"))
    pages = pages_df(spark, SF_SMOKE)
    manifest = sorted(
        export_cdxj(pages, out, shards=4).collect(), key=lambda r: r.first_key
    )
    return pages, manifest


def test_cdxj_round_trip_identity(spark, cdx_export):
    pages, manifest = cdx_export
    rows = [r for m in manifest for r in read_cdxj(m.path)]
    assert sum(m.n_records for m in manifest) == len(rows) == pages.count()
    src = {
        r.url: (hashlib.sha256(bytes(r.html)).hexdigest(), len(bytes(r.html)))
        for r in pages.select("url", "html").collect()
    }
    got = {r["url"]: (r["digest"], r["length"]) for r in rows}
    assert got == src


def test_cdxj_globally_sorted_and_disjoint(cdx_export):
    _, manifest = cdx_export
    # shard ranges disjoint and ordered
    for a, b in zip(manifest, manifest[1:]):
        assert a.last_key <= b.first_key
    # concatenated key sequence is non-decreasing
    keys = [
        (r["surt"], r["ts14"]) for m in manifest for r in read_cdxj(m.path)
    ]
    assert keys == sorted(keys)


def test_cdxj_nat_timestamp_fallback(spark, tmp_path):
    df = spark.createDataFrame(
        [("https://x.example/a", None, b"<p>hi</p>")],
        "url string, warc_ts timestamp, html binary",
    )
    m = export_cdxj(df, str(tmp_path), shards=1).collect()
    rows = read_cdxj(m[0].path)
    assert rows[0]["ts14"] == "20260101000000"
    assert rows[0]["surt"] == "example,x)/a"


def test_cdxj_space_in_url_survives_round_trip(spark, tmp_path):
    """A raw space in the url would shear the space-delimited key; the
    writer percent-encodes it (cc-index convention) before the sort."""
    df = spark.createDataFrame(
        [("https://x.example/a b", None, b"<p>s</p>")],
        "url string, warc_ts timestamp, html binary",
    )
    m = export_cdxj(df, str(tmp_path), shards=1).collect()
    rows = read_cdxj(m[0].path)
    assert rows[0]["surt"] == "example,x)/a%20b"
    assert rows[0]["url"] == "https://x.example/a b"  # json keeps it raw
    assert m[0].first_key.split(" ")[0] == "example,x)/a%20b"


def test_cdxj_lookup_prunes_and_matches_full_scan(spark, cdx_export):
    from pyspark.sql import functions as F

    from ocr_spark.sources.cdx import lookup_cdxj

    pages, manifest = cdx_export
    mdf = spark.createDataFrame(manifest)
    # pick a prefix that lives in ONE shard: the first shard's first host
    first_surt = manifest[0].first_key.split(" ")[0]
    prefix = first_surt.split(")")[0] + ")"
    got = lookup_cdxj(spark, mdf, prefix).collect()
    # equivalence against a full scan of every shard
    from ocr_spark.sources.cdx import read_cdxj

    full = [
        r
        for m in manifest
        for r in read_cdxj(m.path)
        if f"{r['surt']} {r['ts14']}".startswith(prefix)
    ]
    assert {(r.surt, r.ts14, r.url) for r in got} == {
        (r["surt"], r["ts14"], r["url"]) for r in full
    }
    assert len(got) == len(full) > 0
    # the manifest pruning must actually skip shards: the prefix range
    # intersects fewer shards than the manifest lists
    upper = prefix + "￿"
    pruned = mdf.where(
        (F.col("last_key") >= prefix) & (F.col("first_key") < upper)
    ).count()
    assert pruned < len(manifest)


def test_cdxj_lookup_empty_prefix_range(spark, cdx_export):
    from ocr_spark.sources.cdx import lookup_cdxj

    _, manifest = cdx_export
    mdf = spark.createDataFrame(manifest)
    assert lookup_cdxj(spark, mdf, "zzz,nonexistent)").count() == 0
