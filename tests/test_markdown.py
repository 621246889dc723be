"""Markdown export (operators/markdown.py): hand-golden rendering and the
no-new-python-stage plan contract."""

from ocr_spark.operators.extract import extract_pages
from ocr_spark.operators.markdown import markdown_export


def _spans(items):
    # (kind, section, text) in document order, seq assigned here
    return [
        {
            "seq": i, "kind": k, "section": s, "text": t,
            "x0": 0.0, "y0": 0.0, "x1": 1.0, "y1": 1.0, "score": 1.0,
        }
        for i, (k, s, t) in enumerate(items)
    ]


SPAN_SCHEMA = (
    "url string, title string, spans array<struct<seq:int,kind:string,"
    "section:string,text:string,x0:double,y0:double,x1:double,y1:double,"
    "score:double>>"
)


def test_markdown_hand_golden(spark):
    rows = [
        (
            "u1",
            "Page",
            _spans(
                [
                    ("text", "", "intro para"),
                    ("text", "Sec", "body one"),
                    ("text", "Sec", "body two"),
                    ("list", "Sec > Sub", "- a\n- b"),
                    ("code", "python", "print(1)"),
                    ("text", "Sec > Sub", "after code"),
                ]
            ),
        )
    ]
    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    md = markdown_export(df).collect()[0]["markdown"]
    assert md == (
        "# Page\n\n"
        "intro para\n\n"
        "## Sec\n\nbody one\n\n"
        "body two\n\n"
        "### Sub\n\n- a\n- b\n\n"
        "```python\nprint(1)\n```\n\n"
        "after code"  # code span did not reset the section tracker
    )


def test_markdown_empty_title_and_spans(spark):
    rows = [("u1", "", _spans([])), ("u2", "T", _spans([]))]
    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    got = {r["url"]: r["markdown"] for r in markdown_export(df).collect()}
    assert got == {"u1": "", "u2": "# T"}


def test_markdown_heading_level_caps_at_six(spark):
    deep = " > ".join(["s"] * 9)
    rows = [("u", "", _spans([("text", deep, "x")]))]
    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    md = markdown_export(df).collect()[0]["markdown"]
    assert md.startswith("###### s\n\n")


def test_markdown_composes_on_single_python_stage(spark):
    pages = spark.createDataFrame(
        [("u", None, b"<h1>T</h1><p>a b</p>", "t", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    plan = (
        markdown_export(extract_pages(pages))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1  # still ONE python stage
    assert "Exchange" not in plan  # rendering added no shuffle
