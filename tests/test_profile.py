"""One-pass table profiling: correctness on known data, null/distinct
accounting, and the single-aggregate plan shape."""

from ocr_spark.operators.profile import profile_table


def test_profile_known_table(spark):
    rows = [(1, "a"), (2, "b"), (3, None), (3, "b")]
    df = spark.createDataFrame(rows, "id long, v string")
    got = {r.column: r for r in profile_table(df).collect()}
    assert got["id"].n_rows == 4 and got["id"].n_nulls == 0
    assert got["id"].n_distinct == 3
    assert (got["id"].min_str, got["id"].max_str) == ("1", "3")
    assert got["v"].n_nulls == 1 and got["v"].n_distinct == 2
    assert (got["v"].min_str, got["v"].max_str) == ("a", "b")


def test_profile_subset_and_empty(spark):
    df = spark.createDataFrame([(1, "x")], "id long, v string")
    assert [r.column for r in profile_table(df, ["v"]).collect()] == ["v"]
    empty = spark.createDataFrame([], "id long, v string")
    got = {r.column: r for r in profile_table(empty).collect()}
    assert got["id"].n_rows == 0 and got["id"].n_distinct == 0
    assert got["id"].min_str is None


def test_profile_is_one_aggregate_scan(spark):
    from ocr_spark.contract import QUERIES
    from tests.conftest import SF_SMOKE

    plan = (
        QUERIES["profile"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one scan feeding one (expanded) aggregate chain — never a
    # per-column job loop; stack is a generate over the single row
    assert plan.count("Scan parquet") == 1
    assert "Generate" in plan
