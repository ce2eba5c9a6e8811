"""Property tests for the pure-Python wire codecs (r5).

The unit tests pin hand-built cases; these pin the CONTRACTS under
hypothesis-generated inputs: round trips are identity, and torn input
either raises ValueError or yields something other than the original —
never a silent full-length wrong answer.  All pure Python (no Spark
session), so thousands of examples run in seconds.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_components_spark.functions.lz4_codec import (
    lz4_compress,
    lz4_decompress,
)
from opentelemetry_collector_components_spark.functions.protowire import (
    decode_varint,
    encode_varint,
)
from opentelemetry_collector_components_spark.functions.snappy_codec import (
    frame_compress,
    frame_decompress,
    snappy_compress,
    snappy_decompress,
)

# mixes compressible runs with incompressible noise
_blobs = st.one_of(
    st.binary(max_size=2048),
    st.builds(
        lambda w, n: b"".join(w for _ in range(n)),
        st.binary(min_size=1, max_size=32),
        st.integers(min_value=1, max_value=128),
    ),
)


@settings(max_examples=300, deadline=None)
@given(_blobs)
def test_lz4_roundtrip(data):
    assert lz4_decompress(lz4_compress(data)) == data


@settings(max_examples=300, deadline=None)
@given(_blobs.filter(lambda b: len(b) > 0), st.integers(min_value=1, max_value=64))
def test_lz4_truncation_never_silently_complete(data, cut):
    enc = lz4_compress(data)
    torn = enc[: max(0, len(enc) - cut)]
    if not torn:
        return
    try:
        out = lz4_decompress(torn)
    except ValueError:
        return  # fail-loud is the preferred outcome
    # a decode that "succeeds" on torn input must be visibly short —
    # the block format has no length header, so a clean-literal cut can
    # decode, but it can never reproduce the full original
    assert out != data


@settings(max_examples=300, deadline=None)
@given(_blobs)
def test_snappy_block_roundtrip_and_truncation(data):
    enc = snappy_compress(data)
    assert snappy_decompress(enc) == data
    if len(enc) > 1:
        try:
            out = snappy_decompress(enc[:-1])
        except (ValueError, IndexError):
            return
        assert out != data


@settings(max_examples=100, deadline=None)
@given(_blobs, st.integers(min_value=1, max_value=300))
def test_snappy_frame_roundtrip(data, chunk):
    assert frame_decompress(frame_compress(data, chunk_size=chunk)) == data


@settings(max_examples=500, deadline=None)
@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_varint_roundtrip_uint64(n):
    v, pos = decode_varint(encode_varint(n), 0)
    assert v == n and pos == len(encode_varint(n))


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_varint_truncation_raises(n):
    enc = encode_varint(n)
    for k in range(len(enc)):
        if enc[:k] and not enc[k - 1] & 0x80:
            continue  # a shorter VALID varint prefix decodes on its own
        try:
            decode_varint(enc[:k], 0)
        except ValueError:
            continue
        raise AssertionError(f"torn varint {enc[:k]!r} did not raise")
