"""Golden tests for text kernels.

Fixture vectors verbatim from /root/reference/tests/test_utils_text.py
(cleaners :121-143, split_sentences counts :158-188, text_f1 :146-155).
"""

import numpy as np
import pytest

from ocr_spark.kernels.textproc import (
    collapse_whitespace,
    detach_punctuation,
    edit_distance,
    filter_text_result,
    hamming_distance,
    remove_punctuation,
    split_sentences,
    strip,
    text_f1,
)


def test_strip():
    assert strip(" Hello  World !  ") == "Hello  World !"
    assert strip(" Hello  World ! ", rstrip=False) == "Hello  World ! "
    assert strip(" Hello  World ! ", lstrip=False) == " Hello  World !"
    assert collapse_whitespace(" Hello  World   !") == " Hello World !"


def test_punctuation():
    assert detach_punctuation("Bonjour, comment ça va?") == "Bonjour ,  comment ça va ?"
    assert remove_punctuation("Bonjour, comment ça va?") == "Bonjour comment ça va"


def test_text_f1():
    assert list(text_f1("Hello World !", "Hello ! World")) == [1, 1, 1, 1]
    assert list(text_f1("Hello World !", "Hello ! World", normalize=False)) == [0, 1, 1, 1]
    np.testing.assert_allclose(
        text_f1("Hello World !", "Hello ! world", normalize=False), [0, 2 / 3, 2 / 3, 2 / 3]
    )
    assert list(text_f1("Hello World !", "Hello world")) == [1, 1, 1, 1]


@pytest.mark.parametrize(
    "text,target",
    [
        ("Hello World !", 1),
        ("Hello World ! This is a test", 2),
        ("Hello World ? This is a test", 2),
        ("Hello World. This is a test", 2),
        ("Hello World... This is a test.", 2),
        ("This is an url : http://example.example.com", 1),
        ("This is an email : example.example@example.com", 1),
        ("1. First item.\n2. Second item.\n3. 3rd item.", 3),
        ("Examples :\n1. First item.\n2. Second item.\n3. 3rd item.", 4),
        ("Examples : \n1. First item.\n2. Second item.\n3. 3rd item.", 4),
        (
            "Example :\n1. First item\n    1.1 First item A\n    1.2 First item B\n2. Second item",
            5,
        ),
        ("Items are : 1) First item 2) Second item 3) Third item", 1),
        ("List of items :\n- First item\n- Second item\n- Third item", 4),
        ("Equations :\n- 1 + 1 = 2\n- 1 - 1 = 0\n- -1 * 2 = -2", 4),
        ("Equation : 1.2 + 1.8 = 3.0", 1),
        ("Equation 1 : 1.2 + 1.8 = 3. \nEquation 2 : 1.8 - 1.8 = 0.\nend", 3),
        ("1.2 + 1.3 = 2.5. 1.3 + 1.2 = 2.5. Addition is commutative", 3),
        ('She said "Hello World !"', 1),
        ('E.g., "Hello World !"', 1),
        ('E.g. "Hello World !"', 1),
        ('M.H.C.P. stands for "Mental Health Counsuling Program"', 1),
    ],
)
def test_split_sentences(text, target):
    sentences = split_sentences(text)
    assert len(sentences) == target, f"Result: {sentences}"


def test_edit_distance():
    # unweighted normalized case — the one used at inference (base_ocr.py:718)
    assert edit_distance("abc", "abd") == pytest.approx(1 / 3)
    assert edit_distance("kitten", "sitting", normalize=False) == 3
    assert edit_distance("abc", "abc") == 0
    # partial alignment finds the substring
    assert edit_distance("abc", "xxabcxx", partial=True, normalize=False) == 0


def test_hamming():
    assert hamming_distance("abc", "abd") == pytest.approx(1 / 3)
    assert hamming_distance("abc", "abcd") == -1


def test_emission_filter():
    # base_ocr.py:679-725 semantics
    assert filter_text_result("")[0] is False
    assert filter_text_result("word")[0] is False  # single word
    assert filter_text_result("123 456")[0] is False  # non-alpha
    assert filter_text_result("hello world</s>")[0] is True
    keep, cleaned = filter_text_result("hello world</s> ")
    assert cleaned == "hello world"

    reject: set = set()
    keep, _ = filter_text_result(
        "hello worlds", last_emitted=["hello world"], reject=reject
    )
    assert keep is False and "hello worlds" in reject  # near-dup (dist < 0.2)
    keep, _ = filter_text_result(
        "completely different sentence", last_emitted=["hello world"]
    )
    assert keep is True

    # low-score part zeroing
    keep, cleaned = filter_text_result(
        "good line \nbad line", scores=[0.9, 0.1], threshold=0.5
    )
    assert keep and cleaned == "good line"
