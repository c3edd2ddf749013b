import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from engine import codec


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=100, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(codec.varint_decode(codec.varint_encode(arr)), arr)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=300))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(values):
    arr = np.sort(np.array(values, dtype=np.uint64))
    assert np.array_equal(codec.delta_decode(codec.delta_encode(arr), len(arr)), arr)


def test_varint_empty():
    assert codec.varint_encode(np.empty(0, np.uint64)) == b""
    assert codec.varint_decode(b"").size == 0


def test_varint_known_bytes():
    # LEB128: 300 = 0b1_0101100 -> 0xAC 0x02
    assert codec.varint_encode(np.array([300], np.uint64)) == b"\xac\x02"
    assert codec.varint_encode(np.array([0, 1, 127, 128], np.uint64)) == b"\x00\x01\x7f\x80\x01"


def test_floats_roundtrip():
    rng = np.random.default_rng(0)
    arr = rng.random(1000)
    assert np.array_equal(codec.floats_decode(codec.floats_encode(arr)), arr)


def test_block_metadata():
    ids = np.arange(0, 300, dtype=np.uint64)
    impacts = np.linspace(1.0, 4.0, 300)
    last, mx = codec.block_metadata(ids, impacts, block_size=128)
    assert last.tolist() == [127, 255, 299]
    assert mx[0] == impacts[127] and mx[1] == impacts[255] and mx[2] == impacts[299]


def test_varint_decode_count_mismatch():
    buf = codec.varint_encode(np.array([1, 2, 3], np.uint64))
    with pytest.raises(ValueError):
        codec.varint_decode(buf, count=2)


def test_pfor_roundtrip_and_wins_on_uniform_deltas():
    import numpy as np

    from engine import codec

    rng = np.random.default_rng(7)
    # near-uniform small deltas + a few outliers: PFor's home turf
    deltas = rng.integers(1, 200, 5000).astype(np.uint64)
    deltas[::997] = 2**40  # outliers become exceptions
    enc = codec.ints_encode(deltas)
    assert enc[0] == 1, "expected the PFor branch to win"
    out = codec.ints_decode(enc, len(deltas))
    assert np.array_equal(out, deltas)
    # varint of the same stream is larger
    assert len(enc) < len(codec.varint_encode(deltas)) + 1


def test_tagged_codec_picks_varint_for_tiny_lists():
    import numpy as np

    from engine import codec

    vals = np.array([5, 1, 3], dtype=np.uint64)
    enc = codec.ints_encode(vals)
    assert enc[0] in (0, 1)
    assert np.array_equal(codec.ints_decode(enc, 3), vals)


def test_pfor_edge_cases():
    import numpy as np

    from engine import codec

    for vals in (
        np.zeros(300, dtype=np.uint64),
        np.full(128, 2**63 - 1, dtype=np.uint64),
        np.arange(1, dtype=np.uint64),
        np.array([0, 2**63 - 1] * 130, dtype=np.uint64),
    ):
        enc = codec.pfor_encode(vals)
        assert np.array_equal(codec.pfor_decode(enc, len(vals)), vals)
