"""Pure-stdlib media codecs: PNG/BMP/WAV decode against hand-built
fixtures (constructed independently of the encoder under test), plus the
Spark-side multimodal kernels running REAL decode end-to-end.

PNG fixtures are assembled chunk-by-chunk from the public spec (RFC
2083): explicit filter bytes per scanline, so every filter type (None/
Sub/Up/Average/Paeth) is exercised against known pixel values.
"""

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from deimos_spark.functions import mediacodecs as mc


def _chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def _png(width, height, color_type, raw_scanlines, extra_chunks=()):
    """Hand-assemble a PNG from pre-filtered scanline bytes."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    out = mc.PNG_MAGIC + _chunk(b"IHDR", ihdr)
    for c in extra_chunks:
        out += c
    out += _chunk(b"IDAT", zlib.compress(raw_scanlines))
    return out + _chunk(b"IEND", b"")


# ----------------------------------------------------------- PNG decode

def test_png_gray_filter_none():
    # 3x2 grayscale, filter 0 rows, pixel value = x + 10*y
    rows = b"\x00" + bytes([0, 1, 2]) + b"\x00" + bytes([10, 11, 12])
    img = mc.decode_png(_png(3, 2, 0, rows))
    assert (img.width, img.height, img.channels) == (3, 2, 1)
    assert list(img.pixels) == [0, 1, 2, 10, 11, 12]


def test_png_rgb_sub_filter():
    # 3x1 RGB, filter 1 (Sub): raw deltas decode to cumulative sums
    line = b"\x01" + bytes([10, 20, 30]) + bytes([1, 2, 3]) + bytes([4, 5, 6])
    img = mc.decode_png(_png(3, 1, 2, line))
    assert list(img.pixels) == [10, 20, 30, 11, 22, 33, 15, 27, 39]


def test_png_up_filter():
    # 2x2 gray: row0 filter 0 = [50, 60]; row1 filter 2 (Up) adds deltas
    rows = b"\x00" + bytes([50, 60]) + b"\x02" + bytes([5, 6])
    img = mc.decode_png(_png(2, 2, 0, rows))
    assert list(img.pixels) == [50, 60, 55, 66]


def test_png_average_filter():
    # 2x2 gray: row1 filter 3 (Average): x + (left + up)//2
    rows = b"\x00" + bytes([100, 40]) + b"\x03" + bytes([10, 20])
    img = mc.decode_png(_png(2, 2, 0, rows))
    # row1: p0 = 10 + (0+100)//2 = 60 ; p1 = 20 + (60+40)//2 = 70
    assert list(img.pixels) == [100, 40, 60, 70]


def test_png_paeth_filter():
    # 2x2 gray: row1 filter 4 (Paeth)
    rows = b"\x00" + bytes([100, 40]) + b"\x04" + bytes([10, 20])
    img = mc.decode_png(_png(2, 2, 0, rows))
    # p0: a=0,b=100,c=0 -> predictor=b=100 -> 110
    # p1: a=110,b=40,c=100 -> p=50: pa=60,pb=10,pc=50 -> b=40 -> 60
    assert list(img.pixels) == [100, 40, 110, 60]


def test_png_rgba_roundtrip_through_own_encoder():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 4, 4), dtype=np.uint8)
    img = mc.Image(4, 5, 4, px.tobytes())
    out = mc.decode_png(mc.encode_png(img))
    assert (out.width, out.height, out.channels) == (4, 5, 4)
    assert out.pixels == img.pixels


def test_png_palette():
    plte = _chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0, 0, 0, 255]))
    rows = b"\x00" + bytes([0, 1, 2])  # indices into the palette
    img = mc.decode_png(_png(3, 1, 3, rows, extra_chunks=(plte,)))
    assert img.channels == 3
    assert list(img.pixels) == [255, 0, 0, 0, 255, 0, 0, 0, 255]


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(mc.MediaDecodeError):
        mc.decode_png(b"not a png at all")
    # 16-bit depth unsupported
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    bad = mc.PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(mc.MediaDecodeError):
        mc.decode_png(bad)


def test_png_decompression_bomb_is_bounded():
    """A tiny crafted IDAT that inflates to ~100 MB against a 2x2 IHDR
    must not be inflated past the IHDR-implied size — the decode path is
    explicitly for untrusted blobs in large corpora (round-3 ADVICE)."""
    rows = b"\x00" + bytes([1, 2]) + b"\x00" + bytes([3, 4])
    bomb = rows + b"\x00" * (100 * 1024 * 1024)  # ~100 MB of zeros
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    data = (
        mc.PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bomb, 9))  # ~100 KB on the wire
        + _chunk(b"IEND", b"")
    )
    import tracemalloc

    tracemalloc.start()
    img = mc.decode_png(data)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert list(img.pixels) == [1, 2, 3, 4]  # first expect bytes used
    assert peak < 16 * 1024 * 1024  # never materialized the 100 MB


def test_png_absurd_dimensions_rejected():
    """An IHDR claiming gigapixel dimensions routes as a decode error
    instead of an executor-OOM-sized allocation."""
    ihdr = struct.pack(">IIBBBBB", 1 << 16, 1 << 16, 8, 0, 0, 0, 0)
    data = (
        mc.PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(mc.MediaDecodeError, match="decode limit"):
        mc.decode_png(data)


# ---------------------------------------------------------- JPEG decode

from deimos_spark.functions.jpegcodec import (  # noqa: E402
    decode_jpeg,
    encode_jpeg_baseline,
)


def _gradient_rgb(w, h):
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            px[y, x] = (x * 6 % 256, y * 7 % 256, (x + y) * 3 % 256)
    return px


def _uniform_jpeg(w, h, rgb):
    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[:, :] = rgb
    return encode_jpeg_baseline(mc.Image(w, h, 3, px.tobytes()), quality=95)


def test_jpeg_uniform_gray_is_exact():
    """A uniform image is pure DC — the quantize/IDCT path must recover
    it exactly (any zigzag/DCT-convention bug shows up here first)."""
    img = mc.Image(16, 16, 1, bytes([120] * 256))
    out = decode_jpeg(encode_jpeg_baseline(img, quality=90))
    assert (out.width, out.height, out.channels) == (16, 16, 1)
    assert np.abs(out.to_array().astype(int) - 120).max() == 0


def test_jpeg_uniform_rgb_and_nonmultiple_of_8_dims():
    px = np.zeros((24, 17, 3), np.uint8)
    px[:, :] = (200, 50, 90)
    img = mc.Image(17, 24, 3, px.tobytes())
    out = decode_jpeg(encode_jpeg_baseline(img, quality=90))
    assert (out.width, out.height, out.channels) == (17, 24, 3)
    assert np.abs(out.to_array().astype(int) - px.astype(int)).max() <= 2


def test_jpeg_gradient_roundtrip_444():
    px = _gradient_rgb(32, 24)
    img = mc.Image(32, 24, 3, px.tobytes())
    out = decode_jpeg(encode_jpeg_baseline(img, quality=95))
    err = np.abs(out.to_array().astype(int) - px.astype(int))
    assert err.mean() < 3.0 and err.max() <= 40  # lossy but close


def test_jpeg_gradient_roundtrip_420_subsampled():
    """4:2:0: decoder must upsample chroma by sampling factors; odd
    dimensions exercise the edge-padding path."""
    px = _gradient_rgb(37, 25)
    img = mc.Image(37, 25, 3, px.tobytes())
    out = decode_jpeg(encode_jpeg_baseline(img, quality=95, subsample=True))
    assert (out.width, out.height) == (37, 25)
    err = np.abs(out.to_array().astype(int) - px.astype(int))
    assert err.mean() < 6.0  # chroma subsampling costs accuracy, not luma


def test_jpeg_restart_markers():
    """DRI/RSTn: DC predictors reset at each interval; a decoder that
    ignores restarts drifts badly."""
    px = _gradient_rgb(40, 33)
    img = mc.Image(40, 33, 3, px.tobytes())
    data = encode_jpeg_baseline(
        img, quality=95, subsample=True, restart_interval=2
    )
    assert b"\xff\xd0" in data or b"\xff\xd1" in data  # markers present
    out = decode_jpeg(data)
    err = np.abs(out.to_array().astype(int) - px.astype(int))
    assert err.mean() < 6.0


def test_jpeg_quality_monotonic():
    """Lower quality → coarser quantization → larger error, smaller file."""
    px = _gradient_rgb(32, 32)
    img = mc.Image(32, 32, 3, px.tobytes())
    hi = encode_jpeg_baseline(img, quality=95)
    lo = encode_jpeg_baseline(img, quality=10)
    assert len(lo) < len(hi)
    err_hi = np.abs(decode_jpeg(hi).to_array().astype(int) - px.astype(int)).mean()
    err_lo = np.abs(decode_jpeg(lo).to_array().astype(int) - px.astype(int)).mean()
    assert err_hi < err_lo


def test_jpeg_rejects_malformed_truncated_and_garbage():
    px = _gradient_rgb(16, 16)
    data = encode_jpeg_baseline(mc.Image(16, 16, 3, px.tobytes()))
    # flip SOF0 (FFC0) to SOF2 (FFC2): the baseline scan script is not a
    # valid progressive one (Ss=0 with Se=63) — must be contained
    prog = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(mc.MediaDecodeError):
        decode_jpeg(prog)
    # arithmetic-coded process stays refused
    arith = data.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(mc.MediaDecodeError, match="non-baseline"):
        decode_jpeg(arith)
    # truncated scan
    with pytest.raises(mc.MediaDecodeError):
        decode_jpeg(data[: len(data) // 2])
    # garbage after magic
    with pytest.raises(mc.MediaDecodeError):
        decode_jpeg(b"\xff\xd8\xff\xe0 not a real jpeg")


def test_jpeg_dimension_cap():
    import struct as _s

    # hand-build headers claiming gigapixel dims
    sof = _s.pack(">BHHB", 8, 65500, 65500, 1) + bytes([1, 0x11, 0])
    data = (
        b"\xff\xd8"
        + b"\xff\xc0" + _s.pack(">H", len(sof) + 2) + sof
    )
    with pytest.raises(mc.MediaDecodeError, match="decode limit"):
        decode_jpeg(data)


def test_jpeg_sniffed_and_dispatched():
    px = _gradient_rgb(8, 8)
    data = encode_jpeg_baseline(mc.Image(8, 8, 3, px.tobytes()))
    assert mc.sniff_format(data) == "jpeg"
    img = mc.decode_image(data)  # dispatch through the common entry
    assert (img.width, img.height, img.channels) == (8, 8, 3)


# ----------------------------------------------------------- BMP decode

def _bmp_24(width, height, rows_rgb):
    """Hand-build a bottom-up 24-bit BMP from top-down RGB rows."""
    row_bytes = ((width * 3 + 3) // 4) * 4
    px = bytearray()
    for row in reversed(rows_rgb):  # bottom-up storage
        line = bytearray()
        for r, g, b in row:
            line += bytes([b, g, r])  # BGR on disk
        line += b"\x00" * (row_bytes - len(line))
        px += line
    header = b"BM" + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(px), 0, 0, 0, 0)
    return header + dib + bytes(px)


def test_bmp_decode_known_pixels():
    rows = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(1, 2, 3), (4, 5, 6), (7, 8, 9)],
    ]
    img = mc.decode_bmp(_bmp_24(3, 2, rows))
    assert (img.width, img.height, img.channels) == (3, 2, 3)
    arr = img.to_array()
    assert arr[0, 0].tolist() == [255, 0, 0]
    assert arr[1, 2].tolist() == [7, 8, 9]


def test_bmp_rejects_compressed():
    data = bytearray(_bmp_24(1, 1, [[(0, 0, 0)]]))
    data[30:34] = struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(mc.MediaDecodeError):
        mc.decode_bmp(bytes(data))


# ----------------------------------------------------------- WAV decode

def _wav(sample_rate=8000, freq=440.0, seconds=0.5, channels=1):
    n = int(sample_rate * seconds)
    t = np.arange(n) / sample_rate
    samples = (np.sin(2 * np.pi * freq * t) * 20000).astype("<i2")
    if channels == 2:
        samples = np.column_stack([samples, samples]).ravel()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def test_wav_decode_exact_duration_and_samples():
    audio = mc.decode_wav(_wav(sample_rate=8000, seconds=0.5))
    assert audio.sample_rate == 8000
    assert audio.n_frames == 4000
    assert audio.duration_ms == 500
    mono = audio.to_array()
    assert mono.shape == (4000, 1)
    # a full-scale-ish sine: RMS near 20000/32768/sqrt(2)
    rms = float(np.sqrt(np.mean(np.square(mono))))
    assert abs(rms - 20000 / 32768 / np.sqrt(2)) < 0.01


def test_wav_stereo_and_rejects_garbage():
    audio = mc.decode_wav(_wav(channels=2))
    assert audio.n_channels == 2
    assert audio.to_array().shape[1] == 2
    with pytest.raises(mc.MediaDecodeError):
        mc.decode_wav(b"RIFFxxxxWAVEjunk")


# ------------------------------------------------------ derived kernels

def test_sniff_format():
    assert mc.sniff_format(_wav()) == "wav"
    assert mc.sniff_format(_bmp_24(1, 1, [[(0, 0, 0)]])) == "bmp"
    assert mc.sniff_format(_png(1, 1, 0, b"\x00\x00")) == "png"
    assert mc.sniff_format(b"\xff\xd8\xff\xe0jfif") == "jpeg"
    assert mc.sniff_format(b"\x00\x01random") is None


def test_resize_nearest_exact():
    # 2x2 quadrant image resized to 4x4: each quadrant becomes 2x2
    px = np.array(
        [[[0], [100]], [[200], [50]]], dtype=np.uint8
    )
    img = mc.Image(2, 2, 1, px.tobytes())
    out = mc.resize_nearest(img, 4, 4)
    arr = out.to_array()[:, :, 0]
    assert arr[0, 0] == 0 and arr[0, 3] == 100
    assert arr[3, 0] == 200 and arr[3, 3] == 50


def test_image_features_from_real_pixels():
    solid = mc.Image(4, 4, 3, bytes([255, 0, 0] * 16))  # solid red
    feats = mc.image_features(solid, out_dim=10)
    assert len(feats) == 10
    assert feats[0] == pytest.approx(1.0)  # R mean
    assert feats[1] == pytest.approx(0.0)  # R std
    assert feats[2] == pytest.approx(0.0)  # G mean


def test_audio_features_energy_profile():
    # half silence, half tone: first slices ~0 energy, later slices > 0
    sr = 8000
    tone = (np.sin(2 * np.pi * 440 * np.arange(sr // 2) / sr) * 20000).astype("<i2")
    silence = np.zeros(sr // 2, dtype="<i2")
    frames = np.concatenate([silence, tone]).tobytes()
    audio = mc.Audio(sr, 1, 2, frames)
    feats = mc.audio_features(audio, out_dim=4)
    assert feats[0] == pytest.approx(0.0, abs=1e-6)
    assert feats[3] > 0.3


# --------------------------------------- Spark kernels with real decode

@pytest.fixture
def media_df(spark):
    rows = [
        (0, bytearray(_png_gradient(8, 6)), ("image/png", 8, 6, None, None)),
        (1, bytearray(_bmp_24(4, 4, [[(i * 16, 0, 255 - i * 16) for i in range(4)]] * 4)),
         ("image/bmp", 4, 4, None, None)),
        (2, bytearray(b"\xff\xd8\xff\xe0 fake jpeg bytes"), ("image/jpeg", 2, 2, None, None)),
        (3, bytearray(_uniform_jpeg(12, 10, (255, 0, 0))),
         ("image/jpeg", 12, 10, None, None)),
    ]
    from deimos_spark.operators.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _png_gradient(w, h):
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            px[y, x] = (x * 255 // max(w - 1, 1), y * 255 // max(h - 1, 1), 128)
    return mc.encode_png(mc.Image(w, h, 3, px.tobytes()))


def test_spark_image_features_real_decode(spark, media_df):
    from deimos_spark.operators.multimodal import extract_image_features

    out = {r["media_id"]: r for r in extract_image_features(media_df, out_dim=8).collect()}
    assert out[0]["decoded"] and out[1]["decoded"]  # PNG + BMP: real pixels
    assert not out[2]["decoded"]  # corrupt JPEG bytes: stub fallback
    assert out[3]["decoded"]  # REAL baseline JPEG: decoded pixels
    # gradient PNG: R mean = 0.5 (symmetric gradient), B mean = 128/255
    assert out[0]["features"][0] == pytest.approx(0.5, abs=0.01)
    assert out[0]["features"][4] == pytest.approx(128 / 255, abs=0.01)
    # uniform red JPEG: R mean ~1.0, G mean ~0.0 from real pixels
    assert out[3]["features"][0] == pytest.approx(1.0, abs=0.02)
    assert out[3]["features"][2] == pytest.approx(0.0, abs=0.02)


def test_spark_resize_real_decode_roundtrips(spark, media_df):
    from deimos_spark.operators.multimodal import extract_image_features, resize_images

    resized = resize_images(media_df, width=3, height=3)
    rows = {r["media_id"]: r for r in resized.collect()}
    # PNG/BMP outputs are valid PNGs at the new size
    for mid in (0, 1):
        img = mc.decode_png(bytes(rows[mid]["content"]))
        assert (img.width, img.height) == (3, 3)
        assert rows[mid]["meta"]["mime"] == "image/png"
    # composes: feature extraction decodes the resized PNGs for real
    feats = {r["media_id"]: r for r in extract_image_features(resized).collect()}
    assert feats[0]["decoded"] and feats[1]["decoded"]


def test_spark_audio_features_real_decode(spark):
    from deimos_spark.operators.multimodal import MEDIA_SCHEMA, extract_audio_features

    rows = [
        (0, bytearray(_wav(sample_rate=8000, seconds=0.25)), ("audio/wav", None, None, None, 8000)),
        (1, bytearray(b"\x00" * 64), ("audio/mp3", None, None, None, 16000)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in extract_audio_features(df, out_dim=4).collect()}
    assert out[0]["decoded"]
    assert out[0]["est_duration_ms"] == 250  # exact, from the frame count
    assert not out[1]["decoded"]
    assert out[1]["est_duration_ms"] == 2  # stub estimate (64B/2/16k)


def test_spark_strict_mode_raises_for_unsupported(spark, media_df):
    from deimos_spark.operators.multimodal import extract_image_features

    with pytest.raises(Exception, match="NotImplementedError|external codecs"):
        extract_image_features(media_df, strict=True).collect()


# ------------------------------------------------- property-based fuzz

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=20, deadline=None)
@given(
    bw=st.integers(1, 4),
    bh=st.integers(1, 4),
    gray=st.booleans(),
    sub=st.booleans(),
    data=st.data(),
)
def test_jpeg_roundtrip_property_blockwise(bw, bh, gray, sub, data):
    """Block-constant images (one color per 8x8 block) survive baseline
    JPEG nearly exactly: each block is DC-dominated, so quality-95
    round-trip error stays small for ANY color choice. Exercises
    arbitrary block counts, gray vs RGB, and both sampling modes."""
    ch = 1 if gray else 3
    colors = data.draw(
        st.lists(
            st.tuples(*[st.integers(0, 255) for _ in range(ch)]),
            min_size=bw * bh,
            max_size=bw * bh,
        )
    )
    px = np.zeros((bh * 8, bw * 8, ch), dtype=np.uint8)
    for i, c in enumerate(colors):
        y, x = divmod(i, bw)
        px[y * 8 : y * 8 + 8, x * 8 : x * 8 + 8] = c
    img = mc.Image(bw * 8, bh * 8, ch, px.tobytes())
    out = decode_jpeg(
        encode_jpeg_baseline(img, quality=95, subsample=(sub and not gray))
    )
    assert (out.width, out.height, out.channels) == (bw * 8, bh * 8, ch)
    got = out.to_array().reshape(bh * 8, bw * 8, ch).astype(int)
    # luma is block-exact up to quant rounding; chroma edges may bleed
    # one pixel under 4:2:0, so compare block interiors
    for i, c in enumerate(colors):
        y, x = divmod(i, bw)
        inner = got[y * 8 + 2 : y * 8 + 6, x * 8 + 2 : x * 8 + 6]
        assert np.abs(inner - np.array(c)).max() <= 14


@settings(max_examples=200, deadline=None)
@given(data=st.data())
def test_jpeg_decoder_survives_corruption(data):
    """Untrusted-corpus contract: ANY byte corruption of a valid JPEG
    (baseline or progressive) either still decodes or raises
    MediaDecodeError — never a hang, never a raw struct/IndexError/
    numpy exception leaking out."""
    from deimos_spark.functions.jpegcodec import encode_jpeg_progressive

    px = _gradient_rgb(16, 16)
    img = mc.Image(16, 16, 3, px.tobytes())
    enc = (
        encode_jpeg_progressive
        if data.draw(st.booleans())
        else encode_jpeg_baseline
    )
    base = bytearray(enc(img, quality=90))
    n_flips = data.draw(st.integers(1, 8))
    for _ in range(n_flips):
        i = data.draw(st.integers(2, len(base) - 1))  # keep SOI magic
        base[i] = data.draw(st.integers(0, 255))
    try:
        img = decode_jpeg(bytes(base))
        assert img.width > 0 and img.height > 0
    except mc.MediaDecodeError:
        pass  # routable record-level failure — the designed outcome


@settings(max_examples=25, deadline=None)
@given(
    bw=st.integers(1, 4),
    bh=st.integers(1, 4),
    gray=st.booleans(),
    sub=st.booleans(),
    quality=st.sampled_from([30, 85, 95]),
    data=st.data(),
)
def test_jpeg_progressive_matches_baseline(bw, bh, gray, sub, quality, data):
    """The progressive scan script (spectral selection + one successive-
    approximation level, EOB runs, refinement correction bits) must
    reconstruct the SAME coefficients as the baseline encoding of the
    same image — so the decoded pixels agree exactly."""
    from deimos_spark.functions.jpegcodec import encode_jpeg_progressive

    ch = 1 if gray else 3
    colors = data.draw(
        st.lists(
            st.tuples(*[st.integers(0, 255) for _ in range(ch)]),
            min_size=bw * bh,
            max_size=bw * bh,
        )
    )
    px = np.zeros((bh * 8, bw * 8, ch), dtype=np.uint8)
    for i, c in enumerate(colors):
        y, x = divmod(i, bw)
        px[y * 8 : y * 8 + 8, x * 8 : x * 8 + 8] = c
    img = mc.Image(bw * 8, bh * 8, ch, px.tobytes())
    sub = sub and not gray
    base = decode_jpeg(encode_jpeg_baseline(img, quality=quality, subsample=sub))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality=quality, subsample=sub)
    )
    assert (prog.width, prog.height, prog.channels) == (
        base.width, base.height, base.channels,
    )
    a = np.frombuffer(base.pixels, dtype=np.uint8).astype(int)
    b = np.frombuffer(prog.pixels, dtype=np.uint8).astype(int)
    assert np.abs(a - b).max() == 0


def test_jpeg_progressive_non_multiple_of_8_dims():
    """Odd dimensions exercise the non-interleaved component block grids
    (smaller than the MCU grid) and edge-clamped DC scans."""
    from deimos_spark.functions.jpegcodec import encode_jpeg_progressive

    rng = np.random.default_rng(11)
    for (w, h, ch, sub) in [(17, 23, 3, False), (33, 9, 3, True), (7, 5, 1, False)]:
        arr = rng.integers(0, 256, size=(h, w, ch)).astype(np.uint8)
        img = mc.Image(w, h, ch, arr.tobytes())
        base = decode_jpeg(encode_jpeg_baseline(img, quality=85, subsample=sub))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality=85, subsample=sub)
        )
        a = np.frombuffer(base.pixels, dtype=np.uint8).astype(int)
        b = np.frombuffer(prog.pixels, dtype=np.uint8).astype(int)
        assert np.abs(a - b).max() == 0


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    ch=st.sampled_from([1, 2, 3, 4]),
    data=st.data(),
)
def test_png_encode_decode_roundtrip_property(w, h, ch, data):
    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch
            )
        )
    )
    img = mc.Image(w, h, ch, px)
    out = mc.decode_png(mc.encode_png(img))
    assert (out.width, out.height, out.channels) == (w, h, ch)
    assert out.pixels == px


@settings(max_examples=25, deadline=None)
@given(
    sr=st.sampled_from([8000, 16000, 44100]),
    nch=st.sampled_from([1, 2]),
    n=st.integers(1, 500),
    data=st.data(),
)
def test_wav_encode_decode_roundtrip_property(sr, nch, n, data):
    frames = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=n * nch * 2, max_size=n * nch * 2
            )
        )
    )
    a = mc.Audio(sr, nch, 2, frames)
    out = mc.decode_wav(mc.encode_wav(a))
    assert (out.sample_rate, out.n_channels, out.sample_width) == (sr, nch, 2)
    assert out.frames == frames
    assert out.n_frames == n


@settings(max_examples=30, deadline=None)
@given(junk=st.binary(min_size=0, max_size=200))
def test_decoders_reject_or_ignore_junk_without_crashing(junk):
    """Arbitrary bytes must never produce a non-MediaDecodeError crash."""
    for fn in (mc.decode_png, mc.decode_bmp, mc.decode_wav):
        try:
            fn(junk)
        except mc.MediaDecodeError:
            pass
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"{fn.__name__} leaked {type(e).__name__}: {e}")
