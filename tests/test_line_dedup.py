"""Cross-document line boilerplate dedup (operators/dedup.py
line_boilerplate_dedup — the CCNet/RefinedWeb line-level pass)."""

from pyspark.sql import functions as F

from ocr_spark.operators.dedup import line_boilerplate_dedup


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = line_boilerplate_dedup(df, **kw).collect()
    return {r.doc_id: r for r in out}


def test_shared_lines_dropped_unique_kept(spark):
    rows = [
        (1, "NAV BAR\nunique one\nfooter"),
        (2, "nav bar\nunique two\nFooter"),
        (3, "Nav Bar \nunique three\nfooter"),
    ]
    got = _run(spark, rows, min_df=3)
    # normalization (trim+lower) unifies the nav/footer variants
    assert got[1].clean_text == "unique one"
    assert got[2].clean_text == "unique two"
    assert got[3].clean_text == "unique three"
    assert got[1].n_kept == 1 and got[1].n_removed == 2


def test_min_df_threshold_is_distinct_docs_not_occurrences(spark):
    # doc 1 repeats the line 3 times, but only 2 DISTINCT docs carry it:
    # below min_df=3, everything stays
    rows = [
        (1, "promo\npromo\npromo\nbody a"),
        (2, "promo\nbody b"),
        (3, "body c"),
    ]
    got = _run(spark, rows, min_df=3)
    assert got[1].n_removed == 0
    assert got[1].clean_text == "promo\npromo\npromo\nbody a"


def test_line_order_preserved_after_removal(spark):
    rows = [
        (1, "b1\nkeep-a\nb2\nkeep-b\nb1"),
        (2, "b1\nb2\nother1"),
        (3, "b1\nb2\nother2"),
    ]
    got = _run(spark, rows, min_df=3)
    assert got[1].clean_text == "keep-a\nkeep-b"


def test_all_boilerplate_doc_still_emits_empty_row(spark):
    rows = [(1, "same"), (2, "same"), (3, "same")]
    got = _run(spark, rows, min_df=3)
    assert set(got) == {1, 2, 3}
    for r in got.values():
        assert r.clean_text == "" and r.n_kept == 0 and r.n_removed == 1


def test_empty_lines_never_counted_and_always_kept(spark):
    rows = [
        (1, "a\n\nb"),
        (2, "\nc"),
        (3, "\nd"),
    ]
    got = _run(spark, rows, min_df=2)
    # "" appears in all 3 docs but is exempt from the df count
    assert got[1].clean_text == "a\n\nb"
    assert got[2].clean_text == "\nc"
    assert got[2].n_removed == 0


def test_boilerplate_side_is_broadcast(spark):
    """Plan shape: the df-tail join must broadcast its build side — at
    crawl scale the line postings must not shuffle on the Zipf-headed
    norm key."""
    df = spark.createDataFrame(
        [(i, f"nav\nbody {i}") for i in range(10)], "doc_id long, text string"
    )
    plan = line_boilerplate_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_host_template_strip_semantics(spark):
    """Site-scoped templates: host A's nav (on 100% of its 4 pages) and
    footer (3/4 = 75% >= 60%) strip from host A only; host B shares the
    same nav TEXT but has just 2 pages, so min_df=3 protects it; bodies
    always survive."""
    from ocr_spark.operators.dedup import host_template_strip

    rows = []
    for i in range(4):
        footer = "\nfooter a" if i < 3 else ""
        rows.append((i, "a.example", f"nav menu\nbody a{i}{footer}"))
    for i in range(2):
        rows.append((10 + i, "b.example", f"nav menu\nbody b{i}"))
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    got = {
        r.doc_id: r
        for r in host_template_strip(df, pct=60, min_df=3).collect()
    }
    assert got[0].clean_text == "body a0" and got[0].n_removed == 2
    assert got[3].clean_text == "body a3" and got[3].n_removed == 1
    # host B keeps its nav: df=2 < min_df=3
    assert got[10].clean_text == "nav menu\nbody b0" and got[10].n_removed == 0


def test_host_template_strip_all_template_page(spark):
    """A page that is ONLY template still emits a row with empty text."""
    from ocr_spark.operators.dedup import host_template_strip

    rows = [(i, "h", "tpl" if i else "tpl\nunique body") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    got = {r.doc_id: r for r in host_template_strip(df, pct=60, min_df=3).collect()}
    assert got[1].clean_text == "" and got[1].n_kept == 0 and got[1].n_removed == 1
    assert got[0].clean_text == "unique body"
