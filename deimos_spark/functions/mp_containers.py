"""MP3 / MP4 CONTAINER parsing — pure-structure walks over the public
specs, no codecs.

The sandbox has no ffmpeg/PIL, so audio/video SAMPLE decode stays behind
the strict-mode gate in operators/multimodal.py. But the container layer
is pure structure and therefore implementable for real:

- **MP3**: MPEG-1/2/2.5 Layer I-III frame-header walk (ISO/IEC 11172-3
  "header" syntax: 11-bit sync, version/layer ids, bitrate + sample-rate
  tables, padding) with ID3v2 tag skip (id3.org spec: syncsafe size).
  Yields frame count, average bitrate, sample rate, duration — the
  metadata a corpus pipeline actually filters on.
- **MP4**: ISO BMFF (ISO/IEC 14496-12) box walk: ftyp brand; moov/mvhd
  timescale+duration; per-trak tkhd (dimensions), mdia/mdhd
  (track timescale/duration), hdlr (vide/soun), stbl/stsd (codec
  fourcc), and the stsz/stsc/stco|co64 sample tables — resolved into
  per-sample (offset, size) byte ranges, so frame-SAMPLING extracts the
  real encoded access units from the container (the Spark-side plumbing
  the brief asks for); only the codec decode of those bytes is stubbed.

Corrupt-input containment (same discipline as jpegcodec/avro_ocf/deltadv):
every malformed input raises typed `MediaDecodeError`, never a raw
struct/index error that would poison an executor task.

The reference treats payloads as opaque bytes (lib/deimos/message.rb) —
this is part of the beyond-reference multimodal layer.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from deimos_spark.functions.mediacodecs import MediaDecodeError

# ------------------------------------------------------------------ MP3

# bitrate kbps tables, index 1-14 (0 = free, 15 = bad) — ISO 11172-3 / 13818-3
_BITRATES = {
    # (version_key, layer): [index 1..14]
    ("v1", 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    ("v1", 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    ("v1", 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    ("v2", 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    ("v2", 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("v2", 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SAMPLE_RATES = {
    "v1": [44100, 48000, 32000],
    "v2": [22050, 24000, 16000],
    "v25": [11025, 12000, 8000],
}
# samples per frame: (version, layer) — layer II/III v2/v2.5 halve layer III
_SPF = {
    ("v1", 1): 384, ("v1", 2): 1152, ("v1", 3): 1152,
    ("v2", 1): 384, ("v2", 2): 1152, ("v2", 3): 576,
    ("v25", 1): 384, ("v25", 2): 1152, ("v25", 3): 576,
}


@dataclass
class Mp3Info:
    sample_rate: int
    n_frames: int
    duration_ms: int
    bitrate_kbps: int      # average across frames
    layer: int             # 1/2/3
    version: str           # v1 / v2 / v25


def _id3v2_size(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none). Size field is
    4 syncsafe bytes (7 bits each) after the 6-byte header."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    b = data[6:10]
    if any(x & 0x80 for x in b):
        raise MediaDecodeError("ID3v2 size bytes not syncsafe")
    return 10 + ((b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3])


def parse_mp3_info(data: bytes, max_frames: int = 1_000_000) -> Mp3Info:
    """Walk every frame header → stream metadata. Raises
    MediaDecodeError on anything that is not a clean MPEG audio stream.
    """
    try:
        return _parse_mp3_inner(data, max_frames)
    except MediaDecodeError:
        raise
    except (struct.error, IndexError, ValueError, KeyError,
            OverflowError, MemoryError) as e:
        raise MediaDecodeError(f"malformed MP3 stream: {e!r}") from None


def _parse_mp3_inner(data: bytes, max_frames: int) -> Mp3Info:
    pos = _id3v2_size(data)
    if pos >= len(data):
        raise MediaDecodeError("ID3v2 tag consumes the whole payload")
    n = len(data)
    frames = 0
    kbps_sum = 0
    sr = None
    ver = None
    layer = None
    while pos + 4 <= n:
        h = struct.unpack_from(">I", data, pos)[0]
        if (h >> 21) != 0x7FF:
            # trailing garbage / ID3v1 tag: tolerate only at stream end
            if data[pos : pos + 3] == b"TAG" and n - pos == 128:
                break
            raise MediaDecodeError(
                f"lost MPEG frame sync at byte {pos} (frame {frames})"
            )
        vbits = (h >> 19) & 3
        if vbits == 1:
            raise MediaDecodeError("reserved MPEG version id")
        v = {0: "v25", 2: "v2", 3: "v1"}[vbits]
        lbits = (h >> 17) & 3
        if lbits == 0:
            raise MediaDecodeError("reserved MPEG layer id")
        lyr = 4 - lbits  # 3->layer1, 2->layer2, 1->layer3
        bidx = (h >> 12) & 0xF
        if bidx in (0, 15):
            raise MediaDecodeError(
                f"unsupported bitrate index {bidx} (free/bad)"
            )
        sidx = (h >> 10) & 3
        if sidx == 3:
            raise MediaDecodeError("reserved sample-rate index")
        pad = (h >> 9) & 1
        vkey = "v1" if v == "v1" else "v2"
        kbps = _BITRATES[(vkey, lyr)][bidx - 1]
        this_sr = _SAMPLE_RATES[v][sidx]
        if sr is not None and (this_sr != sr or lyr != layer):
            raise MediaDecodeError("sample rate / layer changes mid-stream")
        sr, ver, layer = this_sr, v, lyr
        if lyr == 1:
            flen = (12 * kbps * 1000 // this_sr + pad) * 4
        else:
            spf = _SPF[(v, lyr)]
            flen = spf // 8 * kbps * 1000 // this_sr + pad
        if flen <= 4:
            raise MediaDecodeError(f"degenerate frame length {flen}")
        frames += 1
        kbps_sum += kbps
        if frames > max_frames:
            raise MediaDecodeError(f"more than {max_frames} frames")
        pos += flen
    if frames == 0:
        raise MediaDecodeError("no MPEG audio frames found")
    if pos > n:
        raise MediaDecodeError("last frame truncated")
    spf = _SPF[(ver, layer)]
    return Mp3Info(
        sample_rate=sr,
        n_frames=frames,
        duration_ms=int(frames * spf * 1000 / sr),
        bitrate_kbps=kbps_sum // frames,
        layer=layer,
        version=ver,
    )


def encode_mp3_fixture(
    n_frames: int = 10, sample_rate: int = 44100, kbps: int = 128,
    id3: bytes | None = None,
) -> bytes:
    """Structurally valid MPEG-1 Layer III stream (dummy payloads) for
    tests — real-world files differ only in the payload bits this layer
    never reads."""
    sidx = _SAMPLE_RATES["v1"].index(sample_rate)
    bidx = _BITRATES[("v1", 3)].index(kbps) + 1
    h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)  # v1, L3, no CRC
    h |= (bidx << 12) | (sidx << 10) | (0 << 9) | (3 << 6)  # mono
    header = struct.pack(">I", h)
    flen = 1152 // 8 * kbps * 1000 // sample_rate
    frame = header + b"\x00" * (flen - 4)
    out = bytearray()
    if id3 is not None:
        size = len(id3)
        ss = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F,
             (size >> 7) & 0x7F, size & 0x7F]
        )
        out += b"ID3\x04\x00\x00" + ss + id3
    out += frame * n_frames
    return bytes(out)


# ------------------------------------------------------------------ MP4

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


@dataclass
class Mp4Track:
    handler: str            # "vide" | "soun" | other fourcc
    codec: str              # stsd entry fourcc, e.g. "avc1", "mp4a"
    width: int | None
    height: int | None
    timescale: int
    duration: int
    sample_sizes: list[int] = field(default_factory=list)
    sample_offsets: list[int] = field(default_factory=list)

    @property
    def duration_ms(self) -> int:
        return int(self.duration * 1000 / self.timescale) if self.timescale else 0

    def sample_ranges(self) -> list[tuple[int, int]]:
        """Per-sample (byte offset, size) within the container — what a
        frame sampler reads; len == sample count."""
        return list(zip(self.sample_offsets, self.sample_sizes))


@dataclass
class Mp4Info:
    brand: str
    timescale: int
    duration_ms: int
    tracks: list[Mp4Track]

    def track(self, handler: str) -> Mp4Track | None:
        return next((t for t in self.tracks if t.handler == handler), None)


def parse_mp4_info(data: bytes, max_samples: int = 4_000_000) -> Mp4Info:
    try:
        return _parse_mp4_inner(data, max_samples)
    except MediaDecodeError:
        raise
    except (struct.error, IndexError, ValueError, KeyError,
            UnicodeDecodeError, OverflowError, MemoryError) as e:
        raise MediaDecodeError(f"malformed MP4 container: {e!r}") from None


def _boxes(data: bytes, start: int, end: int):
    """Iterate (type, body_start, body_end) of the boxes in [start, end)."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise MediaDecodeError(f"truncated box header at {pos}")
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise MediaDecodeError("truncated largesize box")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < body - pos or pos + size > end:
            raise MediaDecodeError(
                f"box {btype!r} size {size} overruns its container"
            )
        yield btype, body, pos + size
        pos += size


def _fullbox(data: bytes, start: int) -> tuple[int, int]:
    """(version, flags-skipped body start) of a full box."""
    return data[start], start + 4


def _parse_mp4_inner(data: bytes, max_samples: int) -> Mp4Info:
    brand = ""
    timescale = 0
    duration = 0
    tracks: list[Mp4Track] = []
    saw_moov = False
    for btype, b0, b1 in _boxes(data, 0, len(data)):
        if btype == b"ftyp":
            brand = data[b0 : b0 + 4].decode("ascii", "replace")
        elif btype == b"moov":
            saw_moov = True
            for mtype, m0, m1 in _boxes(data, b0, b1):
                if mtype == b"mvhd":
                    ver, p = _fullbox(data, m0)
                    if ver == 1:
                        _, _, timescale = struct.unpack_from(">QQI", data, p)
                        (duration,) = struct.unpack_from(">Q", data, p + 20)
                    else:
                        _, _, timescale, duration = struct.unpack_from(
                            ">IIII", data, p
                        )
                elif mtype == b"trak":
                    tracks.append(_parse_trak(data, m0, m1, max_samples))
    if not saw_moov:
        raise MediaDecodeError("no moov box — not a complete MP4")
    if timescale <= 0:
        raise MediaDecodeError("mvhd timescale missing or zero")
    return Mp4Info(
        brand=brand,
        timescale=timescale,
        duration_ms=int(duration * 1000 / timescale),
        tracks=tracks,
    )


def _parse_trak(data: bytes, t0: int, t1: int, max_samples: int) -> Mp4Track:
    handler = codec = ""
    width = height = None
    timescale = duration = 0
    sizes: list[int] = []
    stsc: list[tuple[int, int]] = []  # (first_chunk, samples_per_chunk)
    chunk_offsets: list[int] = []
    for btype, b0, b1 in _boxes(data, t0, t1):
        if btype == b"tkhd":
            ver, p = _fullbox(data, b0)
            p += 32 if ver == 1 else 20  # ids/times/reserved
            p += 52  # layer..matrix
            w_fixed, h_fixed = struct.unpack_from(">II", data, p)
            width, height = w_fixed >> 16, h_fixed >> 16
        elif btype == b"mdia":
            for mtype, m0, m1 in _boxes(data, b0, b1):
                if mtype == b"mdhd":
                    ver, p = _fullbox(data, m0)
                    if ver == 1:
                        timescale, duration = struct.unpack_from(
                            ">IQ", data, p + 16
                        )
                    else:
                        timescale, duration = struct.unpack_from(
                            ">II", data, p + 8
                        )
                elif mtype == b"hdlr":
                    _, p = _fullbox(data, m0)
                    handler = data[p + 4 : p + 8].decode("ascii", "replace")
                elif mtype == b"minf":
                    for stype, s0, s1 in _boxes(data, m0, m1):
                        if stype != b"stbl":
                            continue
                        for xtype, x0, x1 in _boxes(data, s0, s1):
                            if xtype == b"stsd":
                                _, p = _fullbox(data, x0)
                                (cnt,) = struct.unpack_from(">I", data, p)
                                if cnt >= 1:
                                    codec = data[p + 8 : p + 12].decode(
                                        "ascii", "replace"
                                    )
                            elif xtype == b"stsz":
                                _, p = _fullbox(data, x0)
                                fixed, cnt = struct.unpack_from(
                                    ">II", data, p
                                )
                                if cnt > max_samples:
                                    raise MediaDecodeError(
                                        f"stsz claims {cnt} samples"
                                    )
                                if fixed:
                                    sizes = [fixed] * cnt
                                else:
                                    if p + 8 + 4 * cnt > x1:
                                        raise MediaDecodeError(
                                            "stsz table truncated"
                                        )
                                    sizes = list(
                                        struct.unpack_from(
                                            f">{cnt}I", data, p + 8
                                        )
                                    )
                            elif xtype == b"stsc":
                                _, p = _fullbox(data, x0)
                                (cnt,) = struct.unpack_from(">I", data, p)
                                if p + 4 + 12 * cnt > x1:
                                    raise MediaDecodeError(
                                        "stsc table truncated"
                                    )
                                for i in range(cnt):
                                    fc, spc, _ = struct.unpack_from(
                                        ">III", data, p + 4 + 12 * i
                                    )
                                    stsc.append((fc, spc))
                            elif xtype in (b"stco", b"co64"):
                                _, p = _fullbox(data, x0)
                                (cnt,) = struct.unpack_from(">I", data, p)
                                w = 4 if xtype == b"stco" else 8
                                if p + 4 + w * cnt > x1:
                                    raise MediaDecodeError(
                                        f"{xtype.decode()} table truncated"
                                    )
                                fmtc = "I" if xtype == b"stco" else "Q"
                                chunk_offsets = list(
                                    struct.unpack_from(
                                        f">{cnt}{fmtc}", data, p + 4
                                    )
                                )
    offsets = _resolve_sample_offsets(sizes, stsc, chunk_offsets, len(data))
    return Mp4Track(
        handler=handler,
        codec=codec,
        width=width,
        height=height,
        timescale=timescale,
        duration=duration,
        sample_sizes=sizes,
        sample_offsets=offsets,
    )


def _resolve_sample_offsets(
    sizes: list[int],
    stsc: list[tuple[int, int]],
    chunk_offsets: list[int],
    file_len: int,
) -> list[int]:
    """stsc (sample→chunk runs) + stco (chunk offsets) + stsz (sizes) →
    absolute per-sample byte offsets, per ISO 14496-12 §8.7."""
    if not sizes or not chunk_offsets:
        return []
    if not stsc:
        raise MediaDecodeError("stsz/stco present but stsc missing")
    # expand runs: stsc entry applies from first_chunk until next entry
    n_chunks = len(chunk_offsets)
    spc_by_chunk: list[int] = []
    for i, (fc, spc) in enumerate(stsc):
        if fc < 1 or fc > n_chunks:
            raise MediaDecodeError(f"stsc first_chunk {fc} out of range")
        until = stsc[i + 1][0] if i + 1 < len(stsc) else n_chunks + 1
        if until <= fc:
            raise MediaDecodeError("stsc first_chunk values not increasing")
        spc_by_chunk.extend([spc] * (until - fc))
    offsets: list[int] = []
    si = 0
    for ci, base in enumerate(chunk_offsets):
        pos = base
        for _ in range(spc_by_chunk[ci] if ci < len(spc_by_chunk) else 0):
            if si >= len(sizes):
                break
            if pos + sizes[si] > file_len:
                raise MediaDecodeError(
                    f"sample {si} extends past end of file"
                )
            offsets.append(pos)
            pos += sizes[si]
            si += 1
    if si != len(sizes):
        raise MediaDecodeError(
            f"sample tables disagree: stsz has {len(sizes)} samples, "
            f"stsc/stco place {si}"
        )
    return offsets


def encode_mp4_fixture(
    samples: list[bytes],
    width: int = 64,
    height: int = 48,
    timescale: int = 600,
    sample_dur: int = 60,
    codec: bytes = b"avc1",
    handler: bytes = b"vide",
) -> bytes:
    """Structurally valid single-track ISO BMFF file whose mdat carries
    `samples` back-to-back — the sample tables resolve to their exact
    byte ranges, so parse → extract round-trips bit-for-bit."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    def full(btype: bytes, body: bytes, ver: int = 0) -> bytes:
        return box(btype, bytes([ver, 0, 0, 0]) + body)

    dur = sample_dur * len(samples)
    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat_body = b"".join(samples)
    # mdat follows moov; compute moov size by building with placeholder
    # offsets first (sizes don't change — offsets are absolute)
    sizes = [len(s) for s in samples]

    def build_moov(mdat_data_start: int) -> bytes:
        stsz = full(
            b"stsz",
            struct.pack(">II", 0, len(samples))
            + b"".join(struct.pack(">I", s) for s in sizes),
        )
        stsc = full(b"stsc", struct.pack(">IIII", 1, 1, len(samples), 1))
        offs = []
        pos = mdat_data_start
        for s in sizes:
            offs.append(pos)
            pos += s
        # one chunk holding all samples (stsc says chunk 1 has them all)
        stco = full(b"stco", struct.pack(">II", 1, offs[0] if offs else 0))
        stsd = full(
            b"stsd",
            struct.pack(">I", 1)
            + box(codec, b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70),
        )
        stbl = box(b"stbl", stsd + stsz + stsc + stco)
        minf = box(b"minf", stbl)
        hdlr = full(b"hdlr", b"\x00" * 4 + handler + b"\x00" * 13)
        mdhd = full(
            b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale, dur, 0x55C4, 0)
        )
        mdia = box(b"mdia", mdhd + hdlr + minf)
        tkhd = full(
            b"tkhd",
            struct.pack(">III", 0, 0, 1)
            + b"\x00" * 8  # reserved + duration(0)
            + b"\x00" * 52
            + struct.pack(">II", width << 16, height << 16),
        )
        trak = box(b"trak", tkhd + mdia)
        mvhd = full(
            b"mvhd",
            struct.pack(">IIII", 0, 0, timescale, dur) + b"\x00" * 80,
        )
        return box(b"moov", mvhd + trak)

    moov0 = build_moov(0)
    data_start = len(ftyp) + len(moov0) + 8  # mdat header is 8 bytes
    moov = build_moov(data_start)
    assert len(moov) == len(moov0)
    return ftyp + moov + box(b"mdat", mdat_body)
