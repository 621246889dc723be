"""XLM alpha=0.5 temperature mixture allocation (operators/mixture)."""

import math

from ocr_spark.operators.mixture import alpha_half_allocation


def _df(spark, sizes):
    rows = []
    i = 0
    for src, n_tokens in sizes.items():
        rows.append((i, src, "w " * n_tokens))
        i += 1
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_allocations_sum_to_budget_and_match_reference(spark):
    sizes = {"web": 10_000, "wiki": 400, "books": 2_500, "code": 90}
    out = {r["source"]: r for r in alpha_half_allocation(_df(spark, sizes)).collect()}
    total = sum(sizes.values())
    budget = total // 2
    assert sum(r["allocation"] for r in out.values()) == budget
    # python reference: identical integer largest-remainder method
    w = {s: math.isqrt(n) for s, n in sizes.items()}
    W = sum(w.values())
    base = {s: budget * w[s] // W for s in sizes}
    rem = {s: budget * w[s] % W for s in sizes}
    leftover = budget - sum(base.values())
    order = sorted(sizes, key=lambda s: (-rem[s], s))
    for i, s in enumerate(order):
        expect = base[s] + (1 if i < leftover else 0)
        assert out[s]["allocation"] == expect
        assert out[s]["weight"] == w[s]


def test_sqrt_upweights_the_tail(spark):
    # alpha=1/2 gives the small source a larger sampling rate (allocation
    # per token) than the big one — the point of temperature sampling
    sizes = {"big": 40_000, "small": 100}
    out = {r["source"]: r for r in alpha_half_allocation(_df(spark, sizes)).collect()}
    assert out["small"]["sample_milli"] > out["big"]["sample_milli"]
    # and proportional-to-sqrt, not proportional-to-size: the ratio of
    # allocations tracks sqrt(40000)/sqrt(100) = 20, not 400
    ratio = out["big"]["allocation"] / max(out["small"]["allocation"], 1)
    assert ratio < 40  # far below the linear 400


def test_deterministic_tie_break(spark):
    sizes = {"a": 100, "b": 100, "c": 100}
    one = alpha_half_allocation(_df(spark, sizes)).collect()
    two = alpha_half_allocation(_df(spark, sizes).repartition(7)).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, two))


# ---------------------------------------------------------------------------
# soft-404 detection from raw HTML (corpus_filters.soft404_from_html)
# ---------------------------------------------------------------------------

def test_soft404_from_html(spark):
    from ocr_spark.operators.corpus_filters import soft404_from_html

    long_body = "<body>" + "real content here " * 30 + "</body>"
    rows = [
        ("a", 200, "<html><head><title>404 Not Found</title></head><body>x</body></html>"),
        ("b", 200, "<html><head><title>Fine</title></head><body>The page you requested does not exist.</body></html>"),
        ("c", 200, "<html><head><title>Fine</title></head>" + long_body + "</html>"),
        ("d", 404, "<html><head><title>404 Not Found</title></head><body>x</body></html>"),
        ("e", 200, "<html><body>tiny honest stub</body></html>"),
        ("f", 200, "<html><head><TITLE>Server Error</TITLE></head>" + long_body + "</html>"),
    ]
    df = spark.createDataFrame(rows, "url string, status int, html string")
    got = {r["url"]: r for r in soft404_from_html(df).collect()}
    assert got["a"]["soft404"] and got["a"]["title_404"] and got["a"]["thin"]
    assert got["b"]["soft404"] and got["b"]["body_404"] and not got["b"]["title_404"]
    assert not got["c"]["soft404"] and not got["c"]["thin"]
    assert not got["d"]["soft404"]  # hard 404 is already honest
    assert not got["e"]["soft404"] and got["e"]["thin"]  # thin alone isn't an error page
    assert got["f"]["soft404"] and got["f"]["title_404"]  # case-insensitive tag+word


# ---------------------------------------------------------------------------
# per-line language segmentation (operators/text_analysis.line_langid)
# ---------------------------------------------------------------------------

def test_line_langid_segments_and_diverges(spark):
    from ocr_spark.operators.text_analysis import line_langid

    text = "\n".join(
        [
            "the cat and dog of note",   # en
            "x le chien et la maison",   # fr
            "   ",                        # blank: dropped, consumes line_no
            "12345 67890",                # und
        ]
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = {r["line_no"]: r for r in line_langid(df).collect()}
    assert set(rows) == {0, 1, 3}  # blank line 2 dropped
    assert rows[0]["line_lang"] == "en" and not rows[0]["diverges"]
    assert rows[1]["line_lang"] == "fr" and rows[1]["diverges"]
    assert rows[3]["line_lang"] == "und" and rows[3]["diverges"]
    # doc-level vote: en and fr tie at 3 -> en by CASE order
    assert all(r["doc_lang"] == "en" for r in rows.values())
