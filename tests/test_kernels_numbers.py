"""Number verbalization kernel (SURVEY.md §2.9 F5 analog)."""

from ocr_spark.kernels.numbers import (
    decimal_to_words,
    int_to_words,
    money_to_words,
    normalize_numbers,
    ordinal_to_words,
    time_to_words,
)


def test_int_to_words():
    assert int_to_words(0) == "zero"
    assert int_to_words(7) == "seven"
    assert int_to_words(13) == "thirteen"
    assert int_to_words(42) == "forty-two"
    assert int_to_words(100) == "one hundred"
    assert int_to_words(105) == "one hundred five"
    assert int_to_words(999) == "nine hundred ninety-nine"
    assert int_to_words(1_000) == "one thousand"
    assert int_to_words(12_345) == "twelve thousand three hundred forty-five"
    assert int_to_words(1_000_006) == "one million six"
    assert int_to_words(-8) == "minus eight"


def test_ordinal_to_words():
    assert ordinal_to_words(1) == "first"
    assert ordinal_to_words(2) == "second"
    assert ordinal_to_words(3) == "third"
    assert ordinal_to_words(4) == "fourth"
    assert ordinal_to_words(12) == "twelfth"
    assert ordinal_to_words(20) == "twentieth"
    assert ordinal_to_words(21) == "twenty-first"
    assert ordinal_to_words(100) == "one hundredth"


def test_decimal_money_time():
    assert decimal_to_words("3.14") == "three point one four"
    assert money_to_words("5") == "five dollars"
    assert money_to_words("1") == "one dollar"
    assert money_to_words("2.50") == "two dollars fifty cents"
    assert money_to_words("3", "£") == "three pounds"
    assert time_to_words(3, 30) == "three thirty"
    assert time_to_words(9, 5) == "nine oh five"
    assert time_to_words(12, 0) == "twelve o'clock"


def test_normalize_numbers_sentence():
    assert (
        normalize_numbers("I paid $2.50 at 9:05 on the 3rd of May, pi is 3.14, 42 items")
        == "I paid two dollars fifty cents at nine oh five on the third of May,"
        " pi is three point one four, forty-two items"
    )


def test_normalize_numbers_udf(spark):
    from pyspark.sql import functions as F

    from ocr_spark.operators.pudf import normalize_numbers_udf

    df = spark.createDataFrame(
        [("a", "room 12"), ("b", "the 2nd door")], "id string, text string"
    )
    got = {
        r.id: r.norm
        for r in df.select("id", normalize_numbers_udf(F.col("text")).alias("norm")).collect()
    }
    assert got == {"a": "room twelve", "b": "the second door"}
