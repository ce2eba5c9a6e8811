"""ISO-BMFF container codec: box grammar, sample-table resolution, and the
Spark parse operator over real MP4 bytes."""

import struct

import pytest

from opentelemetry_collector_components_spark.functions.mp4_codec import (
    encode_mp4,
    extract_samples,
    parse_mp4,
)
from opentelemetry_collector_components_spark.operators.multimodal import (
    _mp4_track_params,
)


@pytest.mark.parametrize("use_64bit", [False, True])
def test_round_trip_multitrack(use_64bit):
    """Encode -> parse recovers every header field and every sample byte,
    through both the stco and co64 (largesize mdat) layouts."""
    for mid in (0, 1, 5, 11, 12):
        tracks = _mp4_track_params(mid)
        data = encode_mp4(tracks, use_64bit=use_64bit)
        p = parse_mp4(data)
        assert p["major_brand"] == "isom"
        assert "mp42" in p["compatible_brands"]
        assert p["movie_timescale"] == 1000
        assert len(p["tracks"]) == len(tracks)
        for spec, t in zip(tracks, p["tracks"]):
            n = len(spec["sample_sizes"])
            assert t["handler"] == spec["handler"]
            assert t["codec"] == spec["codec"]
            assert t["timescale"] == spec["timescale"]
            assert t["n_samples"] == n
            assert t["duration"] == n * spec["sample_delta"]
            assert t["duration"] == t["stts_duration"]
            spc = spec["samples_per_chunk"]
            assert t["n_chunks"] == -(-n // spc)
            if spec["handler"] == "vide":
                assert (t["width"], t["height"]) == (spec["width"], spec["height"])
            else:
                assert t["sample_rate"] == spec["sample_rate"]
            assert extract_samples(data, t) == spec["sample_data"]


def test_movie_duration_is_max_track_scaled():
    tracks = _mp4_track_params(3)  # video + audio
    p = parse_mp4(encode_mp4(tracks))
    want = max(
        len(t["sample_sizes"]) * t["sample_delta"] * 1000 // t["timescale"]
        for t in tracks
    )
    assert p["movie_duration"] == want


def test_fixed_size_stsz_path():
    """A hand-patched stsz with sample_size != 0 (the fixed-size form) must
    resolve identically to the per-entry form."""
    tracks = _mp4_track_params(1)[1:]  # audio only: constant sizes
    data = bytearray(encode_mp4(tracks))
    size = tracks[0]["sample_sizes"][0]
    n = len(tracks[0]["sample_sizes"])
    # stsz payload starts (after 4-byte version/flags): fixed(4), count(4)
    idx = bytes(data).find(b"stsz") + 8
    assert struct.unpack_from(">II", data, idx) == (0, n)
    data[idx:idx + 4] = struct.pack(">I", size)
    # truncate the now-redundant entry table by rewriting box size
    p = parse_mp4(bytes(data))
    t = p["tracks"][0]
    assert t["sample_sizes"] == [size] * n
    assert extract_samples(bytes(data), t) == tracks[0]["sample_data"]


def test_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="ftyp|truncated|invalid"):
        parse_mp4(b"not an mp4 file at all")
    data = encode_mp4(_mp4_track_params(2))
    with pytest.raises(ValueError):
        parse_mp4(data[: len(data) // 2])
    # corrupt a box size mid-tree
    bad = bytearray(data)
    idx = bytes(data).find(b"moov") - 4
    bad[idx:idx + 4] = struct.pack(">I", 7)  # < header size
    with pytest.raises(ValueError, match="invalid box size"):
        parse_mp4(bytes(bad))


def test_sample_data_must_match_sizes():
    t = _mp4_track_params(0)[0]
    t = dict(t, sample_data=[b"x" * 3 for _ in t["sample_sizes"]])
    with pytest.raises(ValueError, match="byte-for-byte"):
        encode_mp4([t])


def test_parse_operator_over_spark(spark):
    """generate -> encode -> Arrow -> parse on executors; plan stays
    ArrowEvalPython-free of per-row Python (mapInPandas only)."""
    from opentelemetry_collector_components_spark.operators.multimodal import (
        generate_mp4_media,
        parse_mp4_media,
    )

    parsed = parse_mp4_media(generate_mp4_media(spark, 24))
    rows = {(r["media_id"], r["track_id"]): r for r in parsed.collect()}
    # one track for even ids, two for odd
    assert len(rows) == 24 + 12
    r = rows[(7, 1)]
    assert (r["codec"], r["width"], r["height"]) == ("hvc1", 16 * (4 + 2), 16 * (3 + 3))
    a = rows[(7, 2)]
    assert (a["handler"], a["codec"], a["sample_rate"]) == ("soun", "mp4a", 8000 + 4000)
    sizes = [50 + (7 + 7 * i) % 40 for i in range(5 + 7 % 7)]
    assert r["total_bytes"] == sum(sizes)
    assert r["byte_sum"] == sum(s * ((7 + i) % 256) for i, s in enumerate(sizes))
    assert "BatchEvalPython" not in parsed._jdf.queryExecution().executedPlan().toString()


def test_missing_required_box_raises_value_error():
    """Review r4: a structurally valid file missing a mandatory box must
    raise the module's ValueError contract, not a None-deref TypeError."""
    data = encode_mp4(_mp4_track_params(4))
    # excise the stco box by renaming it to a free-form type the walker skips
    idx = data.find(b"stco")
    bad = data[:idx] + b"free" + data[idx + 4:]
    with pytest.raises(ValueError, match="stco/co64"):
        parse_mp4(bad)
    idx = data.find(b"stts")
    bad = data[:idx] + b"free" + data[idx + 4:]
    with pytest.raises(ValueError, match="missing required stts"):
        parse_mp4(bad)
