"""Pure-stdlib media codecs: PNG / BMP / WAV decode, PNG encode.

The sandbox ships no PIL/soundfile/ffmpeg, but these container formats
are fully decodable with the standard library alone:

- PNG is zlib (stdlib) + the five scanline filters from the public PNG
  spec (RFC 2083): None/Sub/Up/Average/Paeth. Bit depth 8, interlace 0,
  color types gray / gray+alpha / RGB / RGBA / palette.
- BMP (BITMAPINFOHEADER, 24/32-bit uncompressed) is plain struct
  unpacking — bottom-up BGR rows with 4-byte padding.
- WAV rides on the stdlib `wave` module.

These run INSIDE the Arrow-batched mapInPandas kernels
(operators/multimodal.py) — per-row Python is the accepted cost at the
decode boundary; everything before/after stays JVM-side. At 100 TB the
parallelism is the partition count, not the per-image speed, and a real
deployment would swap these for PIL/libvips behind the same interface.

Decoded images are (width, height, channels, pixels) with pixels in
row-major top-down RGB(A)/gray order — the layout numpy reshapes for
free, so resize/feature kernels are vectorized.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from dataclasses import dataclass

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


class MediaDecodeError(ValueError):
    """Input bytes are not a decodable media payload."""


@dataclass
class Image:
    width: int
    height: int
    channels: int  # 1=gray, 2=gray+alpha, 3=RGB, 4=RGBA
    pixels: bytes  # row-major, top-down, len == w*h*channels

    def to_array(self) -> np.ndarray:
        return np.frombuffer(self.pixels, dtype=np.uint8).reshape(
            self.height, self.width, self.channels
        )


@dataclass
class Audio:
    sample_rate: int
    n_channels: int
    sample_width: int  # bytes per sample
    frames: bytes

    @property
    def n_frames(self) -> int:
        denom = self.n_channels * self.sample_width
        return len(self.frames) // denom if denom else 0

    @property
    def duration_ms(self) -> int:
        return int(self.n_frames / self.sample_rate * 1000) if self.sample_rate else 0

    def to_array(self) -> np.ndarray:
        """Samples as float in [-1, 1], shape (n_frames, n_channels)."""
        if self.sample_width == 1:  # WAV 8-bit is unsigned
            a = np.frombuffer(self.frames, dtype=np.uint8).astype(np.float32)
            a = (a - 128.0) / 128.0
        elif self.sample_width == 2:
            a = np.frombuffer(self.frames, dtype="<i2").astype(np.float32) / 32768.0
        elif self.sample_width == 4:
            a = np.frombuffer(self.frames, dtype="<i4").astype(np.float32) / 2147483648.0
        else:
            raise MediaDecodeError(f"unsupported sample width {self.sample_width}")
        return a.reshape(-1, self.n_channels)


def sniff_format(data: bytes) -> str | None:
    """Magic-byte detection:
    'png' | 'bmp' | 'wav' | 'jpeg' | 'mp3' | 'mp4' | None."""
    if data[:8] == PNG_MAGIC:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[4:8] == b"ftyp":
        return "mp4"
    if data[:3] == b"ID3" or (
        len(data) >= 2 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0
    ):
        return "mp3"
    return None


# ----------------------------------------------------------------- PNG

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> channels
# decode bound for untrusted blobs: 64M pixels (~256 MB RGBA) per image;
# a corpus image larger than this is routed as a decode error, not OOM
_PNG_MAX_PIXELS = 1 << 26


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Undo PNG scanline filtering. `raw` = height * (1 + width*bpp)."""
    stride = width * bpp
    out = bytearray(height * stride)
    prev_start = -1
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        row_start = y * stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            if prev_start >= 0:
                for i in range(stride):
                    line[i] = (line[i] + out[prev_start + i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = out[prev_start + i] if prev_start >= 0 else 0
                line[i] = (line[i] + ((a + b) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = out[prev_start + i] if prev_start >= 0 else 0
                c = out[prev_start + i - bpp] if (prev_start >= 0 and i >= bpp) else 0
                line[i] = (line[i] + _paeth(a, b, c)) & 0xFF
        elif ftype != 0:
            raise MediaDecodeError(f"unknown PNG filter type {ftype}")
        out[row_start : row_start + stride] = line
        prev_start = row_start
    return out


def decode_png(data: bytes) -> Image:
    # malformed chunk structure surfaces as struct/zlib/index errors —
    # normalize to MediaDecodeError (record-level, routable) for corrupt
    # blobs in a large corpus
    try:
        return _decode_png_inner(data)
    except MediaDecodeError:
        raise
    except (struct.error, zlib.error, ValueError, IndexError) as e:
        raise MediaDecodeError(f"malformed PNG: {e!r}") from None


def _decode_png_inner(data: bytes) -> Image:
    if data[:8] != PNG_MAGIC:
        raise MediaDecodeError("not a PNG")
    pos = 8
    width = height = bit_depth = color_type = None
    idat = bytearray()
    palette: bytes | None = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise MediaDecodeError(f"unsupported PNG bit depth {bit_depth}")
            if interlace != 0:
                raise MediaDecodeError("interlaced PNG not supported")
            if color_type not in _PNG_CHANNELS:
                raise MediaDecodeError(f"unsupported PNG color type {color_type}")
        elif ctype == b"PLTE":
            palette = bytes(body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise MediaDecodeError("PNG missing IHDR/IDAT")
    bpp = _PNG_CHANNELS[color_type]
    if width * height > _PNG_MAX_PIXELS:
        raise MediaDecodeError(
            f"PNG dimensions {width}x{height} exceed decode limit"
        )
    # Bounded inflate: this path is explicitly for untrusted blobs in a
    # large corpus, and a tiny crafted IDAT (decompression bomb) must
    # not exhaust executor memory. Output is capped at the size the
    # already-validated IHDR implies; surplus compressed data is simply
    # never inflated.
    expect = height * (1 + width * bpp)
    raw = zlib.decompressobj().decompress(bytes(idat), expect)
    if len(raw) < expect:
        raise MediaDecodeError("PNG pixel data truncated")
    pixels = _unfilter(raw, width, height, bpp)
    if color_type == 3:  # palette -> RGB
        if palette is None:
            raise MediaDecodeError("paletted PNG missing PLTE")
        pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
        idx = np.frombuffer(bytes(pixels), dtype=np.uint8)
        return Image(width, height, 3, pal[idx].tobytes())
    return Image(width, height, bpp, bytes(pixels))


def encode_png(img: Image) -> bytes:
    """Minimal PNG writer: filter 0 scanlines, one IDAT chunk."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(img.channels)
    if color_type is None:
        raise MediaDecodeError(f"cannot encode {img.channels}-channel image")
    stride = img.width * img.channels
    raw = bytearray()
    for y in range(img.height):
        raw.append(0)
        raw += img.pixels[y * stride : (y + 1) * stride]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", img.width, img.height, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


# ----------------------------------------------------------------- BMP

def decode_bmp(data: bytes) -> Image:
    try:
        return _decode_bmp_inner(data)
    except MediaDecodeError:
        raise
    except (struct.error, ValueError, IndexError) as e:
        raise MediaDecodeError(f"malformed BMP: {e!r}") from None


def _decode_bmp_inner(data: bytes) -> Image:
    if data[:2] != b"BM" or len(data) < 54:
        raise MediaDecodeError("not a BMP")
    (pixel_offset,) = struct.unpack("<I", data[10:14])
    width, height = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0 or bpp not in (24, 32):
        raise MediaDecodeError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    bottom_up = height > 0
    height = abs(height)
    nch = bpp // 8
    row_bytes = ((width * nch + 3) // 4) * 4  # rows pad to 4 bytes
    px = np.frombuffer(
        data, dtype=np.uint8, count=row_bytes * height, offset=pixel_offset
    ).reshape(height, row_bytes)[:, : width * nch].reshape(height, width, nch)
    if bottom_up:
        px = px[::-1]
    # BGR(A) -> RGB(A)
    if nch >= 3:
        px = px[:, :, [2, 1, 0] + ([3] if nch == 4 else [])]
    return Image(width, height, 3 if nch == 3 else 4, np.ascontiguousarray(px).tobytes())


# ----------------------------------------------------------------- WAV

def decode_wav(data: bytes) -> Audio:
    # wave raises EOFError/struct.error (not just wave.Error) on
    # truncated input — normalize everything to MediaDecodeError so a
    # corrupt blob in a large corpus is a routable record-level failure,
    # never an unexpected executor exception type
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            return Audio(
                sample_rate=w.getframerate(),
                n_channels=w.getnchannels(),
                sample_width=w.getsampwidth(),
                frames=w.readframes(w.getnframes()),
            )
    except (wave.Error, EOFError, struct.error, ValueError) as e:
        raise MediaDecodeError(f"not a decodable WAV: {e!r}") from None


def encode_wav(audio: Audio) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(audio.n_channels)
        w.setsampwidth(audio.sample_width)
        w.setframerate(audio.sample_rate)
        w.writeframes(audio.frames)
    return buf.getvalue()


# ----------------------------------------------------- derived kernels

def decode_image(data: bytes) -> Image:
    fmt = sniff_format(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "jpeg":
        # local import: jpegcodec imports Image/MediaDecodeError from here
        from deimos_spark.functions.jpegcodec import decode_jpeg

        return decode_jpeg(data)
    raise MediaDecodeError("unknown image format")


def resize_nearest(img: Image, new_w: int, new_h: int) -> Image:
    """Nearest-neighbor resample, vectorized (the kernel PIL's NEAREST
    uses; sufficient for thumbnail/normalize pipelines)."""
    arr = img.to_array()
    ys = (np.arange(new_h) * img.height) // new_h
    xs = (np.arange(new_w) * img.width) // new_w
    out = arr[ys][:, xs]
    return Image(new_w, new_h, img.channels, np.ascontiguousarray(out).tobytes())


def image_features(img: Image, out_dim: int = 16) -> list[float]:
    """Deterministic real-pixel features: per-channel mean/std in [0,1]
    plus a luminance histogram filling the remaining dims."""
    arr = img.to_array().astype(np.float32) / 255.0
    feats: list[float] = []
    for c in range(img.channels):
        feats.append(float(arr[:, :, c].mean()))
        feats.append(float(arr[:, :, c].std()))
    lum = arr[:, :, : min(img.channels, 3)].mean(axis=2)
    nbins = max(out_dim - len(feats), 1)
    hist, _ = np.histogram(lum, bins=nbins, range=(0.0, 1.0))
    feats += (hist / max(lum.size, 1)).astype(float).tolist()
    return feats[:out_dim] + [0.0] * max(out_dim - len(feats), 0)


def audio_features(audio: Audio, out_dim: int = 16) -> list[float]:
    """Deterministic real-sample features: RMS energy over out_dim equal
    time slices of the mono mix."""
    mono = audio.to_array().mean(axis=1)
    n = len(mono)
    if n == 0:
        return [0.0] * out_dim
    edges = np.linspace(0, n, out_dim + 1).astype(int)
    return [
        float(np.sqrt(np.mean(np.square(mono[s:e])))) if e > s else 0.0
        for s, e in zip(edges[:-1], edges[1:])
    ]
