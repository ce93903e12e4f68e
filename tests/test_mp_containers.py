"""MP3 frame-header walk + MP4 ISO-BMFF box walk (pure-structure
container parsing, functions/mp_containers.py): metadata correctness
against hand-computable fixtures, real MP4 sample extraction, the
probe_media operator over a mixed corpus, and corrupt-input containment
(every malformed payload → typed MediaDecodeError, never a raw
struct/index error)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from deimos_spark.functions.mediacodecs import MediaDecodeError, sniff_format
from deimos_spark.functions.mp_containers import (
    encode_mp3_fixture,
    encode_mp4_fixture,
    parse_mp3_info,
    parse_mp4_info,
)

# ------------------------------------------------------------------ MP3


def test_mp3_metadata_exact():
    data = encode_mp3_fixture(n_frames=38, sample_rate=44100, kbps=128)
    assert sniff_format(data) == "mp3"
    info = parse_mp3_info(data)
    assert (info.version, info.layer) == ("v1", 3)
    assert info.sample_rate == 44100
    assert info.n_frames == 38
    assert info.bitrate_kbps == 128
    # 38 frames x 1152 samples @ 44100 Hz
    assert info.duration_ms == int(38 * 1152 * 1000 / 44100)


def test_mp3_id3v2_tag_skipped():
    data = encode_mp3_fixture(n_frames=5, id3=b"\x00" * 57)
    assert sniff_format(data) == "mp3"
    assert parse_mp3_info(data).n_frames == 5


def test_mp3_rejects_mid_stream_garbage():
    data = encode_mp3_fixture(n_frames=3)
    flen = len(data) // 3
    # clobber the SECOND frame's sync word (payload bytes are opaque)
    broken = data[:flen] + b"\x00\x00" + data[flen + 2:]
    with pytest.raises(MediaDecodeError, match="sync"):
        parse_mp3_info(broken)


def test_mp3_trailing_id3v1_tolerated():
    data = encode_mp3_fixture(n_frames=4) + b"TAG" + b"\x00" * 125
    assert parse_mp3_info(data).n_frames == 4


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.binary(min_size=0, max_size=400))
def test_mp3_fuzz_contained(blob):
    try:
        parse_mp3_info(blob)
    except MediaDecodeError:
        pass  # the only acceptable failure mode


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(0, 500), st.integers(0, 255))
def test_mp3_byteflip_fuzz_contained(pos, val):
    data = bytearray(encode_mp3_fixture(n_frames=6))
    data[pos % len(data)] = val
    try:
        parse_mp3_info(bytes(data))
    except MediaDecodeError:
        pass


# ------------------------------------------------------------------ MP4


def test_mp4_metadata_and_real_sample_extraction():
    samples = [b"frame-%d-" % i + bytes([i]) * (10 + i) for i in range(7)]
    data = encode_mp4_fixture(
        samples, width=320, height=240, timescale=600, sample_dur=60
    )
    assert sniff_format(data) == "mp4"
    info = parse_mp4_info(data)
    assert info.brand == "isom"
    assert info.duration_ms == int(7 * 60 * 1000 / 600)
    trk = info.track("vide")
    assert trk is not None
    assert (trk.width, trk.height) == (320, 240)
    assert trk.codec == "avc1"
    assert trk.sample_sizes == [len(s) for s in samples]
    # the sample tables resolve to the EXACT encoded bytes
    for (off, size), want in zip(trk.sample_ranges(), samples):
        assert data[off : off + size] == want


def test_mp4_rejects_missing_moov():
    data = encode_mp4_fixture([b"x"])
    # keep only ftyp + mdat
    import struct

    (ftyp_size,) = struct.unpack_from(">I", data, 0)
    (moov_size,) = struct.unpack_from(">I", data, ftyp_size)
    no_moov = data[:ftyp_size] + data[ftyp_size + moov_size:]
    with pytest.raises(MediaDecodeError, match="moov"):
        parse_mp4_info(no_moov)


def test_mp4_rejects_overrunning_box():
    import struct

    bad = struct.pack(">I", 10_000) + b"ftypisom"
    with pytest.raises(MediaDecodeError, match="overruns|truncated"):
        parse_mp4_info(bad)


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.binary(min_size=0, max_size=400))
def test_mp4_fuzz_contained(blob):
    try:
        parse_mp4_info(blob)
    except MediaDecodeError:
        pass


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(0, 10_000), st.integers(0, 255))
def test_mp4_byteflip_fuzz_contained(pos, val):
    data = bytearray(
        encode_mp4_fixture([b"abc" * 10, b"de" * 8], width=16, height=16)
    )
    data[pos % len(data)] = val
    try:
        parse_mp4_info(bytes(data))
    except MediaDecodeError:
        pass


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.binary(min_size=1, max_size=64), min_size=1, max_size=12),
    st.integers(1, 10_000),
    st.integers(1, 255),
)
def test_mp4_fixture_roundtrip_property(samples, timescale, sample_dur):
    """Any sample list round-trips: parse must locate every sample's
    exact bytes and reproduce the duration arithmetic."""
    data = encode_mp4_fixture(
        samples, timescale=timescale, sample_dur=sample_dur
    )
    info = parse_mp4_info(data)
    assert info.duration_ms == int(
        len(samples) * sample_dur * 1000 / timescale
    )
    trk = info.track("vide")
    got = [data[o : o + s] for o, s in trk.sample_ranges()]
    assert got == samples


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.integers(1, 200),
    st.sampled_from([32000, 44100, 48000]),
    st.sampled_from([32, 64, 128, 192, 320]),
)
def test_mp3_fixture_roundtrip_property(n_frames, sr, kbps):
    info = parse_mp3_info(encode_mp3_fixture(n_frames, sr, kbps))
    assert info.n_frames == n_frames
    assert info.sample_rate == sr
    assert info.bitrate_kbps == kbps


# ------------------------------------------- Spark operators over them


def test_probe_media_mixed_corpus(spark):
    from deimos_spark.functions import mediacodecs as mc
    from deimos_spark.operators import multimodal as mm

    png = mc.encode_png(
        mc.Image(width=3, height=2, channels=3, pixels=bytes(18))
    )
    wav = mc.encode_wav(
        mc.Audio(sample_rate=8000, n_channels=1, sample_width=2,
                 frames=b"\x00\x00" * 800)
    )
    mp3 = encode_mp3_fixture(n_frames=10)
    mp4 = encode_mp4_fixture([b"s0s0", b"s1"], width=64, height=48)
    df = spark.createDataFrame(
        [
            (1, bytearray(png)),
            (2, bytearray(wav)),
            (3, bytearray(mp3)),
            (4, bytearray(mp4)),
            (5, bytearray(b"not media at all")),
            (6, None),
        ],
        "media_id long, content binary",
    )
    got = {r.media_id: r.asDict() for r in mm.probe_media(df).collect()}
    assert got[1]["format"] == "png" and (got[1]["width"], got[1]["height"]) == (3, 2)
    assert got[2]["format"] == "wav" and got[2]["duration_ms"] == 100
    assert got[3]["format"] == "mp3"
    assert got[3]["duration_ms"] == int(10 * 1152 * 1000 / 44100)
    assert got[3]["sample_rate"] == 44100 and got[3]["codec"] == "mpeg1-L3"
    assert got[4]["format"] == "mp4" and got[4]["codec"] == "avc1"
    assert (got[4]["width"], got[4]["height"]) == (64, 48)
    assert got[4]["n_samples"] == 2
    assert got[5]["error"] == "unknown format"
    assert got[6]["n_bytes"] is None and got[6]["error"] is None


def test_sample_frames_demuxes_real_mp4_samples(spark):
    from deimos_spark.operators import multimodal as mm

    samples = [b"AU<%d>" % i * 3 for i in range(9)]
    mp4 = encode_mp4_fixture(samples)
    df = spark.createDataFrame(
        [(7, bytearray(mp4))], "media_id long, content binary"
    )
    out = mm.sample_frames(df, every_n=3, max_frames=3).collect()
    assert [r.frame_idx for r in out] == [0, 3, 6]
    assert [bytes(r.frame) for r in out] == [samples[0], samples[3], samples[6]]


def test_audio_features_mp3_real_duration(spark):
    from deimos_spark.operators import multimodal as mm

    mp3 = encode_mp3_fixture(n_frames=20, sample_rate=32000, kbps=64)
    df = spark.createDataFrame(
        [(1, bytearray(mp3), None)],
        "media_id long, content binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:bigint,"
        "sample_rate:int>",
    )
    row = mm.extract_audio_features(df).head()
    assert row.decoded is False  # features are stubbed...
    assert row.est_duration_ms == int(20 * 1152 * 1000 / 32000)  # ...duration real
    with pytest.raises(Exception, match="MP3 sample decode"):
        mm.extract_audio_features(df, strict=True).collect()