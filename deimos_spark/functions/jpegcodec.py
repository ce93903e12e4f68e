"""JPEG (JFIF) codec in pure stdlib + numpy — no PIL/libjpeg.

Implements the DCT processes of the public JPEG spec (ITU-T T.81 /
ISO 10918-1): baseline sequential (SOF0/1 — marker parsing, DQT/DHT
loading, Huffman entropy decode with DC prediction + AC run-length,
restart markers) AND progressive (SOF2, Annex G — spectral selection,
successive approximation with DC/AC refinement passes and EOB runs),
then dequantize, batched 8x8 inverse DCT (numpy), sampling-aware MCU
reassembly (4:4:4 / 4:2:2 / 4:2:0), and JFIF YCbCr→RGB. Arithmetic
coding and 12-bit precision are rejected with MediaDecodeError — the
multimodal operators route those to the strict-mode gate exactly like
any corrupt blob.

The encoders exist so the decoder is testable without external codecs:
standard Annex-K quantization tables (libjpeg-style quality scaling)
written INTO the stream as DQT/DHT — so round-trip correctness never
depends on the constants matching any other implementation; the
progressive encoder emits the common 4-phase scan script (DC first/
refine, per-component AC first/refine). Closes the reference-parity gap
for image columns (reference treats payloads as opaque bytes; see
SURVEY §2 multimodal).

Decode bound: like decode_png, this path is for untrusted corpus blobs —
dimensions are capped before any allocation.
"""

from __future__ import annotations

import struct

import numpy as np

from deimos_spark.functions.mediacodecs import Image, MediaDecodeError

_MAX_PIXELS = 1 << 26  # same decode bound as PNG (~256 MB RGB)

# natural-order index for each zigzag position (T.81 Figure 5)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1/K.2 example quantization tables (natural order, row-major)
QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
HT_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
             list(range(12)))
HT_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
               list(range(12)))
HT_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)
HT_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)

# orthonormal 8-point DCT-II basis: forward F = D @ (X-128) @ D.T,
# inverse X = D.T @ F @ D + 128 — exactly the T.81 FDCT/IDCT pair
_D = np.zeros((8, 8))
for _i in range(8):
    _c = np.sqrt(0.5) if _i == 0 else 1.0
    for _j in range(8):
        _D[_i, _j] = 0.5 * _c * np.cos((2 * _j + 1) * _i * np.pi / 16)


def _build_huffman_codes(bits, values):
    """Canonical Huffman code assignment (T.81 Annex C): returns
    {symbol: (code, length)}."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_huffman_decoder(bits, values):
    """{(length, code): symbol} for bit-serial decode."""
    out = {}
    for sym, (code, length) in _build_huffman_codes(bits, values).items():
        out[(length, code)] = sym
    return out


# ------------------------------------------------------------------ decoder

class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing. Markers end the
    readable stream; RSTn are consumed by `restart()`."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker = None  # pending marker byte (e.g. 0xD9, 0xD0..0xD7)

    def _fill(self) -> bool:
        d = self.data
        if self.marker is not None or self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2  # stuffed literal 0xFF
            else:
                self.marker = nxt  # entropy data ends here
                return False
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise MediaDecodeError("JPEG scan data truncated")
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an expected RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        if self.marker is None:
            # seek forward to the marker (decoder already consumed the
            # segment's final partial byte via alignment)
            self._fill()
        m = self.marker
        if m is None or not (0xD0 <= m <= 0xD7):
            raise MediaDecodeError("JPEG missing restart marker")
        self.marker = None
        self.pos += 2


def _extend(v: int, n: int) -> int:
    """T.81 EXTEND: map n received bits to a signed coefficient."""
    return v - ((1 << n) - 1) if v < (1 << (n - 1)) else v


def _decode_huff(reader: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise MediaDecodeError("invalid JPEG Huffman code")


def decode_jpeg(data: bytes) -> Image:
    try:
        return _decode_jpeg_inner(data)
    except MediaDecodeError:
        raise
    except (struct.error, IndexError, ValueError, ArithmeticError) as e:
        raise MediaDecodeError(f"malformed JPEG: {e!r}") from None


def _decode_jpeg_inner(data: bytes) -> Image:
    if data[:2] != b"\xff\xd8":
        raise MediaDecodeError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> decoder
    restart_interval = 0
    frame = None  # (height, width, components)
    progressive = False
    prog = None  # _ProgState once the first progressive scan begins

    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise MediaDecodeError("JPEG marker desync")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(data):
            raise MediaDecodeError("JPEG truncated in marker segment")
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen

        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq != 0:
                    raise MediaDecodeError("16-bit quant tables unsupported")
                zz = np.frombuffer(body[i : i + 64], dtype=np.uint8).astype(
                    np.int32
                )
                i += 64
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = zz
                qtables[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htables[(tc, th)] = _build_huffman_decoder(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec, h, w, nf = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise MediaDecodeError("only 8-bit JPEG supported")
            if h * w > _MAX_PIXELS:
                raise MediaDecodeError(
                    f"JPEG dimensions {w}x{h} exceed decode limit"
                )
            comps = []
            for c in range(nf):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise MediaDecodeError("non-baseline JPEG process unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise MediaDecodeError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c : 3 + 2 * c]
                comp = next(
                    (x for x in frame[2] if x["id"] == cs), None
                )
                if comp is None:
                    raise MediaDecodeError("JPEG scan references unknown component")
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            if not progressive:
                return _decode_scan(
                    data, pos, frame, scan, qtables, htables, restart_interval
                )
            if prog is None:
                prog = _ProgState(frame)
            if len(body) < 1 + 2 * ns + 3:
                raise MediaDecodeError("JPEG SOS header truncated")
            sshdr = body[1 + 2 * ns]
            sehdr = body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            pos = prog.decode_scan(
                data, pos, scan, htables, restart_interval,
                sshdr, sehdr, ahal >> 4, ahal & 0x0F,
            )
        # else: APPn/COM/etc — skipped
    if prog is not None:
        return _reconstruct(
            frame[2], prog.stores, qtables, prog.hmax, prog.vmax,
            frame[0], frame[1],
        )
    raise MediaDecodeError("JPEG has no scan data")


def _clip32(v: int) -> int:
    return max(-2147483648, min(2147483647, int(v)))


class _ProgState:
    """Persistent state of a progressive (SOF2) decode across scans:
    per-component zigzag coefficient stores on the interleaved MCU grid,
    filled in by spectral-selection / successive-approximation scans per
    T.81 Annex G, then handed to the shared `_reconstruct` tail. DC
    scans walk the interleaved MCU grid (or the component block grid
    when single-component); AC scans are always non-interleaved over the
    component's true block grid, with EOB-run state and the G.2
    refinement correction-bit protocol."""

    def __init__(self, frame):
        height, width, comps = frame
        if not (1 <= len(comps) <= 4):
            raise MediaDecodeError("unsupported JPEG component count")
        self.hmax = max(c["h"] for c in comps)
        self.vmax = max(c["v"] for c in comps)
        if (
            not (1 <= self.hmax <= 4 and 1 <= self.vmax <= 4)
            or any(c["h"] < 1 or c["v"] < 1 for c in comps)
        ):
            raise MediaDecodeError("bad JPEG sampling factors")
        self.mcux = (width + 8 * self.hmax - 1) // (8 * self.hmax)
        self.mcuy = (height + 8 * self.vmax - 1) // (8 * self.vmax)
        self.comps = comps
        self.stores = [
            np.zeros((self.mcuy * c["v"], self.mcux * c["h"], 64), np.int32)
            for c in comps
        ]
        # non-interleaved block grid: ceil dims of the component itself
        self.bdims = []
        for c in comps:
            cw = (width * c["h"] + self.hmax - 1) // self.hmax
            ch = (height * c["v"] + self.vmax - 1) // self.vmax
            self.bdims.append(((ch + 7) // 8, (cw + 7) // 8))

    def _ci(self, comp) -> int:
        return next(i for i, c in enumerate(self.comps) if c is comp)

    def decode_scan(
        self, data, pos, scan, htables, ri, ss, se, ah, al
    ) -> int:
        """Decode one scan's entropy segment starting at `pos`; returns
        the position of the next marker."""
        if ss == 0:
            if se != 0:
                raise MediaDecodeError("JPEG DC scan with Se != 0")
        else:
            if len(scan) != 1:
                raise MediaDecodeError(
                    "JPEG progressive AC scan must be single-component"
                )
            if not (ss <= se <= 63):
                raise MediaDecodeError("bad JPEG spectral selection")
        if al > 13 or (ah and ah != al + 1):
            raise MediaDecodeError("bad JPEG successive approximation")
        reader = _BitReader(data, pos)
        if ss == 0:
            self._dc_scan(reader, scan, htables, ri, ah, al)
        else:
            self._ac_scan(reader, scan[0], htables, ri, ss, se, ah, al)
        return reader.pos

    # ------------------------------------------------------------ DC scans

    def _dc_block(self, reader, tab, blk, preds, si, ah, al) -> None:
        if ah == 0:
            s = _decode_huff(reader, tab)
            if s > 15:
                raise MediaDecodeError("JPEG DC size out of range")
            diff = _extend(reader.receive(s), s) if s else 0
            preds[si] = _clip32(preds[si] + diff)
            blk[0] = _clip32(preds[si] * (1 << al))
        elif reader.read_bit():
            blk[0] |= 1 << al

    def _dc_scan(self, reader, scan, htables, ri, ah, al) -> None:
        tabs = []
        for _comp, td, _ta in scan:
            if ah == 0:
                t = htables.get((0, td))
                if t is None:
                    raise MediaDecodeError(
                        "JPEG scan uses undefined Huffman table"
                    )
                tabs.append(t)
            else:
                tabs.append(None)  # refinement reads raw bits
        preds = [0] * len(scan)
        n = 0
        if len(scan) == 1:  # non-interleaved: the component's own grid
            comp = scan[0][0]
            ci = self._ci(comp)
            bh, bw = self.bdims[ci]
            for by in range(bh):
                for bx in range(bw):
                    if ri and n and n % ri == 0:
                        reader.restart()
                        preds = [0]
                    self._dc_block(
                        reader, tabs[0], self.stores[ci][by, bx],
                        preds, 0, ah, al,
                    )
                    n += 1
            return
        for my in range(self.mcuy):
            for mx in range(self.mcux):
                if ri and n and n % ri == 0:
                    reader.restart()
                    preds = [0] * len(scan)
                for si, (comp, _td, _ta) in enumerate(scan):
                    ci = self._ci(comp)
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            blk = self.stores[ci][
                                my * comp["v"] + by, mx * comp["h"] + bx
                            ]
                            self._dc_block(
                                reader, tabs[si], blk, preds, si, ah, al
                            )
                n += 1

    # ------------------------------------------------------------ AC scans

    def _ac_scan(self, reader, entry, htables, ri, ss, se, ah, al) -> None:
        comp, _td, ta = entry
        tab = htables.get((1, ta))
        if tab is None:
            raise MediaDecodeError("JPEG scan uses undefined Huffman table")
        ci = self._ci(comp)
        bh, bw = self.bdims[ci]
        store = self.stores[ci]
        eobrun = 0
        n = 0
        for by in range(bh):
            for bx in range(bw):
                if ri and n and n % ri == 0:
                    reader.restart()
                    eobrun = 0
                blk = store[by, bx]
                if ah == 0:
                    eobrun = self._ac_first(
                        reader, tab, blk, ss, se, al, eobrun
                    )
                else:
                    eobrun = self._ac_refine(
                        reader, tab, blk, ss, se, al, eobrun
                    )
                n += 1

    @staticmethod
    def _ac_first(reader, tab, blk, ss, se, al, eobrun) -> int:
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = _decode_huff(reader, tab)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.receive(r)
                return eobrun
            k += r
            if k > se:
                raise MediaDecodeError("JPEG AC run overflow")
            blk[k] = _clip32(_extend(reader.receive(s), s) * (1 << al))
            k += 1
        return 0

    @staticmethod
    def _ac_refine(reader, tab, blk, ss, se, al, eobrun) -> int:
        """G.2 correction pass: nonzero-history coefficients get one
        correction bit as the position pointer passes them; runs count
        only zero-history positions; new coefficients arrive as ±1·2^Al.
        Returns the remaining EOB run."""
        p1 = 1 << al
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _decode_huff(reader, tab)
                r, s = rs >> 4, rs & 0x0F
                val = 0
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.receive(r)
                        break
                    # r == 15: ZRL — run of 16 zero-history positions
                else:
                    if s != 1:
                        raise MediaDecodeError(
                            "bad JPEG AC refinement symbol"
                        )
                    val = p1 if reader.read_bit() else -p1
                while k <= se:
                    c = int(blk[k])
                    if c != 0:
                        if reader.read_bit() and (c & p1) == 0:
                            blk[k] = _clip32(c + (p1 if c >= 0 else -p1))
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    blk[k] = val
                k += 1
        if eobrun > 0:
            # this block is a member of the EOB run: correction bits for
            # every remaining nonzero-history position in the band
            while k <= se:
                c = int(blk[k])
                if c != 0 and reader.read_bit() and (c & p1) == 0:
                    blk[k] = _clip32(c + (p1 if c >= 0 else -p1))
                k += 1
            return eobrun - 1
        return 0


def _decode_scan(data, pos, frame, scan, qtables, htables, restart_interval):
    height, width, comps = frame
    if not (1 <= len(scan) <= 4):
        raise MediaDecodeError("unsupported JPEG component count")
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise MediaDecodeError("bad JPEG sampling factors")
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    # per-component zigzag coefficient store [blocks_y, blocks_x, 64]
    stores = []
    for comp, _, _ in scan:
        stores.append(
            np.zeros((mcuy * comp["v"], mcux * comp["h"], 64), dtype=np.int32)
        )

    reader = _BitReader(data, pos)
    preds = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                preds = [0] * len(scan)
            for ci, (comp, td, ta) in enumerate(scan):
                dc_tab = htables.get((0, td))
                ac_tab = htables.get((1, ta))
                if dc_tab is None or ac_tab is None:
                    raise MediaDecodeError("JPEG scan uses undefined Huffman table")
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        blk = stores[ci][
                            my * comp["v"] + by, mx * comp["h"] + bx
                        ]
                        s = _decode_huff(reader, dc_tab)
                        if s > 15:
                            # T.81 F.1.2.1: DC size category <= 11 for 8-bit
                            # precision; anything above 15 is only reachable
                            # via a corrupted DHT and would build an unbounded
                            # int in receive().
                            raise MediaDecodeError("JPEG DC size out of range")
                        diff = _extend(reader.receive(s), s) if s else 0
                        # Clamp the predictor into int32: corrupt entropy data
                        # can otherwise accumulate past the store's dtype and
                        # raise OverflowError at assignment.
                        preds[ci] = max(
                            -2147483648, min(2147483647, preds[ci] + diff)
                        )
                        blk[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(reader, ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise MediaDecodeError("JPEG AC run overflow")
                            blk[k] = _extend(reader.receive(s), s)
                            k += 1
            mcu_count += 1

    comps = [comp for comp, _, _ in scan]
    return _reconstruct(comps, stores, qtables, hmax, vmax, height, width)


def _reconstruct(comps, stores, qtables, hmax, vmax, height, width) -> Image:
    """Shared tail of both DCT processes: dequantize the per-component
    zigzag coefficient stores, batched IDCT, sampling-aware upsample,
    JFIF color convert."""
    planes = []
    for ci, comp in enumerate(comps):
        q = qtables.get(comp["tq"])
        if q is None:
            raise MediaDecodeError("JPEG component uses undefined quant table")
        zz = stores[ci]
        nat = np.zeros_like(zz)
        nat[:, :, ZIGZAG] = zz
        blocks = nat.reshape(zz.shape[0], zz.shape[1], 8, 8) * q
        # batched IDCT: X = D.T @ F @ D + 128 over every block at once
        pix = np.einsum("ij,abjk,kl->abil", _D.T, blocks.astype(np.float64), _D)
        pix = np.clip(np.round(pix + 128.0), 0, 255).astype(np.uint8)
        plane = pix.transpose(0, 2, 1, 3).reshape(
            zz.shape[0] * 8, zz.shape[1] * 8
        )
        # upsample to full MCU-grid resolution by sample-factor replication
        plane = np.repeat(
            np.repeat(plane, vmax // comp["v"], axis=0),
            hmax // comp["h"],
            axis=1,
        )
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        return Image(width, height, 1, planes[0].tobytes())
    if len(planes) != 3:
        raise MediaDecodeError("unsupported JPEG color layout")
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    # JFIF (BT.601 full-range) YCbCr -> RGB
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )
    return Image(width, height, 3, rgb.tobytes())


# ------------------------------------------------------------------ encoder

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.bitbuf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.bitbuf = (self.bitbuf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.bitbuf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s (spec F.1.2.3)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _size_of(v: int) -> int:
    return int(v).bit_length() if v else 0  # v must be |value|


def _encode_block(bw, zz, pred, dc_codes, ac_codes):
    diff = int(zz[0]) - pred
    s = _size_of(abs(diff))
    code, length = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            bw.write(c, ln)
            run -= 16
        s = _size_of(abs(v))
        c, ln = ac_codes[(run << 4) | s]
        bw.write(c, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]
        bw.write(c, ln)
    return int(zz[0])


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Pad plane to 8-multiples (edge-replicate), forward DCT + quantize
    every block, return zigzag coeffs [by, bx, 64]."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    p = np.pad(plane.astype(np.float64) - 128.0, ((0, ph), (0, pw)), "edge")
    by, bx = p.shape[0] // 8, p.shape[1] // 8
    blocks = p.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ij,abjk,kl->abil", _D, blocks, _D.T)
    qc = np.round(coef / q).astype(np.int32)
    return qc.reshape(by, bx, 64)[:, :, _NAT2ZZ]


# permutation taking natural-order flat coeffs to zigzag order
_NAT2ZZ = np.array(ZIGZAG)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht_body(tc, th, table) -> bytes:
    bits, vals = table
    return bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)


def _encode_headers(img: Image, quality: int, subsample: bool, sof_marker: int):
    """Shared front half of both encoders: color convert + subsample +
    FDCT/quantize, and the SOI..DHT header bytes. Returns
    (out, ncomp, samp, coefs)."""
    arr = img.to_array()
    if img.channels == 1:
        planes = [arr[:, :, 0] if arr.ndim == 3 else arr]
    elif img.channels == 3:
        rf = arr[:, :, 0].astype(np.float64)
        gf = arr[:, :, 1].astype(np.float64)
        bf = arr[:, :, 2].astype(np.float64)
        y = 0.299 * rf + 0.587 * gf + 0.114 * bf
        cb = -0.168736 * rf - 0.331264 * gf + 0.5 * bf + 128.0
        cr = 0.5 * rf - 0.418688 * gf - 0.081312 * bf + 128.0
        planes = [np.clip(np.round(p), 0, 255) for p in (y, cb, cr)]
        if subsample:
            for i in (1, 2):
                p = planes[i]
                ph, pw = -p.shape[0] % 2, -p.shape[1] % 2
                p = np.pad(p, ((0, ph), (0, pw)), "edge")
                planes[i] = (
                    p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2)
                    .mean(axis=(1, 3))
                )
    else:
        raise MediaDecodeError(
            f"cannot JPEG-encode {img.channels}-channel image"
        )

    ncomp = len(planes)
    qlum = _scaled_qt(QT_LUM, quality).reshape(8, 8)
    qchr = _scaled_qt(QT_CHROM, quality).reshape(8, 8)
    samp = [(2, 2), (1, 1), (1, 1)] if (ncomp == 3 and subsample) else [
        (1, 1)
    ] * ncomp

    coefs = [
        _fdct_quant(planes[i], qlum if i == 0 else qchr)
        for i in range(ncomp)
    ]

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(
        int(qlum.reshape(64)[ZIGZAG[i]]) for i in range(64)
    ))
    if ncomp == 3:
        out += _seg(0xDB, bytes([0x01]) + bytes(
            int(qchr.reshape(64)[ZIGZAG[i]]) for i in range(64)
        ))
    sof = struct.pack(">BHHB", 8, img.height, img.width, ncomp)
    for i in range(ncomp):
        h, v = samp[i]
        sof += bytes([i + 1, (h << 4) | v, 0 if i == 0 else 1])
    out += _seg(sof_marker, sof)
    out += _seg(0xC4, _dht_body(0, 0, HT_DC_LUM))
    out += _seg(0xC4, _dht_body(1, 0, HT_AC_LUM))
    if ncomp == 3:
        out += _seg(0xC4, _dht_body(0, 1, HT_DC_CHROM))
        out += _seg(0xC4, _dht_body(1, 1, HT_AC_CHROM))
    return out, ncomp, samp, coefs


def encode_jpeg_baseline(
    img: Image, quality: int = 85, subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encoder (test-fixture generator). Grayscale or RGB;
    subsample=True uses 4:2:0 chroma, else 4:4:4."""
    out, ncomp, samp, coefs = _encode_headers(img, quality, subsample, 0xC0)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)

    dc_lum = _build_huffman_codes(*HT_DC_LUM)
    ac_lum = _build_huffman_codes(*HT_AC_LUM)
    dc_chr = _build_huffman_codes(*HT_DC_CHROM)
    ac_chr = _build_huffman_codes(*HT_AC_CHROM)
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcux = (img.width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (img.height + 8 * vmax - 1) // (8 * vmax)

    bw = _BitWriter()
    preds = [0] * ncomp
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * ncomp
            for ci in range(ncomp):
                h, v = samp[ci]
                dc = dc_lum if ci == 0 else dc_chr
                ac = ac_lum if ci == 0 else ac_chr
                cz = coefs[ci]
                for by in range(v):
                    for bx in range(h):
                        yy = min(my * v + by, cz.shape[0] - 1)
                        xx = min(mx * h + bx, cz.shape[1] - 1)
                        preds[ci] = _encode_block(
                            bw, cz[yy, xx], preds[ci], dc, ac
                        )
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ----------------------------------------------------- progressive encoder

# Flat AC Huffman table for progressive scans: every (run,size) symbol —
# including the EOBn symbols 0x10..0xE0 that the Annex-K baseline tables
# don't carry — at a fixed 8/9-bit length (255 codes at 8 bits + 1 at 9;
# an incomplete canonical code, which T.81 permits). Compression is
# deliberately traded for coverage: this is a fixture generator whose
# job is to exercise the decoder's EOB-run and refinement paths.
_HT_AC_FLAT = ([0] * 7 + [255, 1] + [0] * 7, list(range(256)))


def _tz_div(v: int, d: int) -> int:
    """AC point transform: integer divide truncating toward zero
    (T.81 G.1.2.2 — DC uses arithmetic shift instead)."""
    return -((-v) // d) if v < 0 else v // d


def _emit_dc_diff(bw, codes, diff: int) -> None:
    s = _size_of(abs(diff))
    c, ln = codes[s]
    bw.write(c, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)


def _flush_eob_run(bw, ac_codes, run: int) -> int:
    while run > 0:
        chunk = min(run, 32767)
        r = chunk.bit_length() - 1
        c, ln = ac_codes[r << 4]
        bw.write(c, ln)
        if r:
            bw.write(chunk - (1 << r), r)
        run -= chunk
    return 0


def encode_jpeg_progressive(
    img: Image, quality: int = 85, subsample: bool = False
) -> bytes:
    """Progressive (SOF2) JFIF encoder — fixture generator for the
    Annex-G decoder. Scan script (spectral selection + one successive-
    approximation level, the common libjpeg-style shape):

      1. DC first, all components interleaved, Ah=0 Al=1
      2. DC refinement, Ah=1 Al=0
      3. per component: AC first Ss=1..63 Ah=0 Al=1 (EOB-run coded)
      4. per component: AC refinement Ss=1..63 Ah=1 Al=0
         (correction bits + per-block EOB)

    Restart intervals are not emitted in progressive mode."""
    out, ncomp, samp, coefs = _encode_headers(img, quality, subsample, 0xC2)
    out += _seg(0xC4, _dht_body(1, 0, _HT_AC_FLAT))
    dc_codes = [
        _build_huffman_codes(*(HT_DC_LUM if i == 0 else HT_DC_CHROM))
        for i in range(ncomp)
    ]
    ac_codes = _build_huffman_codes(*_HT_AC_FLAT)
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcux = (img.width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (img.height + 8 * vmax - 1) // (8 * vmax)

    def sos_seg(entries, ss, se, ah, al) -> bytes:
        body = bytes([len(entries)])
        for cid, td, ta in entries:
            body += bytes([cid, (td << 4) | ta])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def dc_mcu_walk():
        """(ci, by, bx) in interleaved MCU order, edge-clamped exactly
        like the baseline encoder's entropy loop."""
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(ncomp):
                    h, v = samp[ci]
                    cz = coefs[ci]
                    for by in range(v):
                        for bx in range(h):
                            yy = min(my * v + by, cz.shape[0] - 1)
                            xx = min(mx * h + bx, cz.shape[1] - 1)
                            yield ci, yy, xx

    # ---- scan 1: DC first at Al=1 (DC point transform = arith shift)
    out += sos_seg(
        [(i + 1, 0 if i == 0 else 1, 0) for i in range(ncomp)], 0, 0, 0, 1
    )
    bw = _BitWriter()
    preds = [0] * ncomp
    for ci, yy, xx in dc_mcu_walk():
        v = int(coefs[ci][yy, xx][0]) >> 1
        _emit_dc_diff(bw, dc_codes[ci], v - preds[ci])
        preds[ci] = v
    bw.flush()
    out += bw.out

    # ---- scan 2: DC refinement — bit 0 of every DC, same walk
    out += sos_seg([(i + 1, 0, 0) for i in range(ncomp)], 0, 0, 1, 0)
    bw = _BitWriter()
    for ci, yy, xx in dc_mcu_walk():
        bw.write(int(coefs[ci][yy, xx][0]) & 1, 1)
    bw.flush()
    out += bw.out

    # ---- scans 3..: AC first per component at Al=1, non-interleaved
    for ci in range(ncomp):
        out += sos_seg([(ci + 1, 0, 0)], 1, 63, 0, 1)
        bw = _BitWriter()
        eob = 0
        cz = coefs[ci]
        for by in range(cz.shape[0]):
            for bx in range(cz.shape[1]):
                t = [_tz_div(int(cz[by, bx][k]), 2) for k in range(64)]
                last = max((k for k in range(1, 64) if t[k]), default=0)
                if last == 0:
                    eob += 1
                    continue
                eob = _flush_eob_run(bw, ac_codes, eob)
                run = 0
                for k in range(1, last + 1):
                    v = t[k]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        c, ln = ac_codes[0xF0]
                        bw.write(c, ln)
                        run -= 16
                    s = _size_of(abs(v))
                    c, ln = ac_codes[(run << 4) | s]
                    bw.write(c, ln)
                    bw.write(v if v > 0 else v + (1 << s) - 1, s)
                    run = 0
                if last < 63:
                    eob += 1
        _flush_eob_run(bw, ac_codes, eob)
        bw.flush()
        out += bw.out

    # ---- scans 4..: AC refinement per component at Al=0. The emission
    # mirrors the decoder's walk exactly: symbol, sign, then correction
    # bits for the positions the decoder passes before placing the new
    # coefficient (ZRL consumes corrections only up to its 16th
    # zero-history position).
    for ci in range(ncomp):
        out += sos_seg([(ci + 1, 0, 0)], 1, 63, 1, 0)
        bw = _BitWriter()
        cz = coefs[ci]
        for by in range(cz.shape[0]):
            for bx in range(cz.shape[1]):
                events = []  # position-ordered: corr bit / zero / new sign
                for k in range(1, 64):
                    v = int(cz[by, bx][k])
                    h = _tz_div(v, 2)
                    if h != 0:
                        events.append(("corr", abs(v) & 1))
                    elif v != 0:  # |v| == 1 by construction
                        events.append(("new", 1 if v > 0 else 0))
                    else:
                        events.append(("zero", 0))
                i, n = 0, len(events)
                while i < n:
                    j, zeros, found = i, 0, None
                    while j < n:
                        kind = events[j][0]
                        if kind == "new":
                            found = j
                            break
                        if kind == "zero":
                            zeros += 1
                        j += 1
                    if found is None:
                        if any(ev[0] != "corr" or True for ev in events[i:]):
                            # positions remain → EOB0, then corrections
                            c, ln = ac_codes[0x00]
                            bw.write(c, ln)
                            for ev in events[i:]:
                                if ev[0] == "corr":
                                    bw.write(ev[1], 1)
                        break
                    while zeros > 15:
                        c, ln = ac_codes[0xF0]
                        bw.write(c, ln)
                        cnt = 0
                        while cnt < 16:
                            ev = events[i]
                            i += 1
                            if ev[0] == "corr":
                                bw.write(ev[1], 1)
                            else:
                                cnt += 1
                        zeros -= 16
                    c, ln = ac_codes[(zeros << 4) | 1]
                    bw.write(c, ln)
                    bw.write(events[found][1], 1)
                    while i < found:
                        ev = events[i]
                        i += 1
                        if ev[0] == "corr":
                            bw.write(ev[1], 1)
                    i = found + 1
        bw.flush()
        out += bw.out

    out += b"\xff\xd9"  # EOI
    return bytes(out)
