"""Unicode script-mix routing: range counts and dominant-script argmax."""


def test_script_mix_counts_and_dominant(spark):
    from ocr_spark.operators.text_analysis import script_mix

    rows = [
        (1, "hello мир мир"),          # latin 5, cyrillic 6 -> cyrillic
        (2, "你好 hello"),              # han 2, latin 5 -> latin
        (3, "   123 !!! "),            # no script chars -> none
        (4, "abc абв"),                # 3 vs 3 tie -> name tiebreak: latin
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in script_mix(df).collect()}
    assert (got[1].latin, got[1].cyrillic, got[1].dominant) == (5, 6, "cyrillic")
    assert (got[2].han, got[2].latin, got[2].dominant) == (2, 5, "latin")
    assert got[3].dominant == "none"
    assert (got[4].latin, got[4].cyrillic) == (3, 3)
    assert got[4].dominant == "latin"  # tie -> lexicographically LAST name
