import pandas as pd

from embedanything_spark.analyzer import tokenize, tokenize_batch


def test_basic():
    assert tokenize("Hello, World!") == ["hello", "world"]


def test_empty_and_none():
    assert tokenize("") == []
    assert tokenize(None) == []


def test_non_ascii_and_nfc():
    # NFD e + combining acute must normalize to the NFC single char
    assert tokenize("héllo") == tokenize("héllo")
    assert tokenize("世界 café") == ["世界", "café"]


def test_punct_adjacent():
    assert tokenize("foo.bar a,b") == ["foo", "bar", "a", "b"]


def test_underscore_and_digits():
    assert tokenize("a_b c3") == ["a_b", "c3"]


def test_batch_matches_scalar():
    s = pd.Series(["Hello World", "", "foo.bar", None])
    out = tokenize_batch(s)
    assert list(out) == [["hello", "world"], [], ["foo", "bar"], []]
