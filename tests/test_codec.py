"""Codec unit tests with byte-exact goldens (FIXTURES.md §4; style of
the reference's hand-computed kernel tests, pooling.rs:183-239)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from embedanything_spark.index.codec import (delta_decode, delta_encode,
                                             varint_decode, varint_encode)


def test_golden_blobs():
    # hand-computed LEB128
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([1, 2, 3], dtype=np.uint64)) == b"\x01\x02\x03"
    assert varint_encode(np.array([127, 128, 300], dtype=np.uint64)) == \
        b"\x7f\x80\x01\xac\x02"


def test_empty():
    assert varint_encode(np.empty(0, dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0
    assert delta_encode(np.empty(0, dtype=np.uint64)) == b""
    assert delta_decode(b"").size == 0


def test_large_gaps():
    vals = np.array([0, 1, 2**28, 2**28 + 1, 2**40, 2**62], dtype=np.uint64)
    got = delta_decode(delta_encode(vals))
    np.testing.assert_array_equal(got, vals)


def test_10k_random_sorted():
    rng = np.random.default_rng(42)
    vals = np.unique(rng.integers(0, 2**45, size=10_000).astype(np.uint64))
    np.testing.assert_array_equal(delta_decode(delta_encode(vals)), vals)
    np.testing.assert_array_equal(varint_decode(varint_encode(vals)), vals)


def test_compression_wins_on_dense_lists():
    vals = np.arange(0, 50_000, 3, dtype=np.uint64)  # small deltas
    assert len(delta_encode(vals)) < vals.size * 2


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
def test_varint_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    np.testing.assert_array_equal(varint_decode(varint_encode(vals)), vals)


@settings(max_examples=200, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**62), max_size=300))
def test_delta_roundtrip_property(xs):
    vals = np.array(sorted(xs), dtype=np.uint64)
    np.testing.assert_array_equal(delta_decode(delta_encode(vals)), vals)
