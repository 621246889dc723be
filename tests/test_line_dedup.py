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
