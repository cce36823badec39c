"""Baseline JPEG (ITU T.81 SOF0) decode + encode — pure stdlib/numpy.

Completes the image-decode story (sources/pixels.py covers
PNG/BMP/PPM/GIF): marker parsing (DQT/SOF0/DHT/SOS, APPn/COM skipping),
canonical Huffman table construction from DHT, entropy decode with
0xFF00 byte-unstuffing, DC prediction + magnitude "extend", AC
run/size with ZRL and EOB, de-zigzag, dequantize, orthonormal 8×8
IDCT, level shift, and YCbCr→RGB for 4:4:4 three-component scans
(grayscale replicates Y). Progressive (SOF2), arithmetic coding,
subsampled chroma and restart markers are rejected with clear errors.

The encoder is the test harness's independent inverse. It emits
valid-but-simple canonical Huffman tables (fixed code length per
table, which the DHT segment fully describes — decoders must handle
arbitrary tables, so this exercises the general path), and supports an
all-ones quantization table. Two exactness windows make the codec
oracle-checkable despite JPEG being lossy:

* a CONSTANT 8×8 block has a DC-only DCT; with quant=1 the DC survives
  integer rounding exactly and the IDCT of a DC-only block is exact,
  so blockwise-constant grayscale images round-trip BIT-EXACTLY;
* q76's JPEG assets are exactly such images (block value =
  closed-form formula of the block index), so the analytic SQL oracle
  extends to JPEG unchanged.

Scale shape: used via the same mapInPandas pixel_stats operator —
map-only, no shuffle, exact integer outputs.
"""

from __future__ import annotations

import struct

import numpy as np

# orthonormal 8x8 DCT-II matrix: F = C @ B @ C.T, B = C.T @ F @ C
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)


# ---------------------------------------------------------------------------
# bit I/O with JPEG byte stuffing
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        while self.n:  # pad with 1-bits per spec
            self.write(1, 1)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG entropy stream")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                elif 0xD0 <= nxt <= 0xD7:
                    raise ValueError("JPEG restart markers not supported")
                else:
                    raise ValueError("unexpected marker inside entropy data")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v


# ---------------------------------------------------------------------------
# canonical Huffman from DHT (BITS + HUFFVAL)
# ---------------------------------------------------------------------------

def _build_decode_table(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """{(length, code) -> symbol} per the T.81 canonical ordering."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map an s-bit magnitude to its signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) JPEG to (h, w, 3) uint8 RGB.
    Grayscale replicates Y; 3-component scans must be 4:4:4."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    width = height = None
    comps: list[tuple[int, int, int, int]] = []  # (id, h, v, tq)
    scan: list[tuple[int, int, int]] = []  # (comp_idx, dc_id, ac_id)
    data_at = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI with no scan
            break
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        seg = payload[pos + 4 : pos + 2 + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = np.frombuffer(seg, np.uint8, 64, p + 1)
                qt[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            height, width = struct.unpack(">HH", seg[1:5])
            n = seg[5]
            for ci in range(n):
                cid, hv, tq = seg[6 + 3 * ci], seg[7 + 3 * ci], seg[8 + 3 * ci]
                h_s, v_s = hv >> 4, hv & 0xF
                if (h_s, v_s) != (1, 1):
                    raise ValueError("subsampled chroma not supported (4:4:4 only)")
                comps.append((cid, h_s, v_s, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG frame type SOF{marker - 0xC0}")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = seg[p + 17 : p + 17 + nv]
                huff[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:
            raise ValueError("JPEG restart intervals not supported")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                idx = next(i for i, c in enumerate(comps) if c[0] == cs)
                scan.append((idx, tt >> 4, tt & 0xF))
            data_at = pos + 2 + seg_len
            break
        # APPn / COM / others: skip
        pos += 2 + seg_len
    if width is None or data_at is None or not scan:
        raise ValueError("JPEG missing SOF0 or SOS")
    reader = _BitReader(payload[data_at:])
    bw, bh = (width + 7) // 8, (height + 7) // 8
    planes = [np.zeros((bh * 8, bw * 8), dtype=np.float64) for _ in scan]
    pred = [0] * len(scan)
    for by in range(bh):
        for bx in range(bw):
            for si, (ci, dc_id, ac_id) in enumerate(scan):
                dc_tbl = huff.get((0, dc_id))
                ac_tbl = huff.get((1, ac_id))
                if dc_tbl is None or ac_tbl is None:
                    raise ValueError("JPEG scan references missing DHT table")
                zz = np.zeros(64, dtype=np.int64)
                s = _huff_decode(reader, dc_tbl)
                diff = _extend(reader.read_bits(s), s) if s else 0
                pred[si] += diff
                zz[0] = pred[si]
                k = 1
                while k < 64:
                    rs = _huff_decode(reader, ac_tbl)
                    r, sz = rs >> 4, rs & 0xF
                    if sz == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("JPEG AC run overflow")
                    zz[k] = _extend(reader.read_bits(sz), sz)
                    k += 1
                block = np.zeros(64, dtype=np.float64)
                block[_ZIGZAG] = zz * qt[comps[ci][3]].reshape(64)[_ZIGZAG]
                px = _C.T @ block.reshape(8, 8) @ _C
                planes[si][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = px
    out = [
        np.clip(np.round(p[:height, :width] + 128), 0, 255) for p in planes
    ]
    if len(out) == 1:
        g = out[0].astype(np.uint8)
        return np.dstack([g, g, g])
    if len(out) != 3:
        raise ValueError(f"unsupported JPEG component count {len(out)}")
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.dstack([r, g, b])), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _fixed_huff_spec(symbols: list[int]) -> tuple[list[int], bytes]:
    """A valid canonical table giving every symbol the same code length
    L with 2^L > len(symbols) (so the all-ones code stays reserved)."""
    n = len(symbols)
    length = max(2, (n + 1).bit_length())
    bits = [0] * 16
    bits[length - 1] = n
    return bits, bytes(symbols)


def _encode_table(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    """{symbol -> (code, length)} mirroring _build_decode_table."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _encode_blocks(
    writer: _BitWriter,
    plane: np.ndarray,
    quant: np.ndarray,
    dc: dict[int, tuple[int, int]],
    ac: dict[int, tuple[int, int]],
    pred: int,
) -> int:
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    for by in range(bh):
        for bx in range(bw):
            block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = np.round((_C @ block @ _C.T) / quant).astype(np.int64)
            zz = coef.reshape(64)[_ZIGZAG]
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            s = _category(diff)
            code, ln = dc[s]
            writer.write(code, ln)
            if s:
                writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    if k > last_nz:
                        code, ln = ac[0x00]  # EOB
                        writer.write(code, ln)
                        break
                    run += 1
                    if run == 16:
                        code, ln = ac[0xF0]  # ZRL
                        writer.write(code, ln)
                        run = 0
                    continue
                sz = _category(v)
                code, ln = ac[(run << 4) | sz]
                writer.write(code, ln)
                writer.write(v if v >= 0 else v + (1 << sz) - 1, sz)
                run = 0
    return pred


def _pad_to_blocks(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def encode_jpeg(px: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB as baseline 4:4:4 JPEG.
    ``quant=np.ones((8, 8))`` makes blockwise-constant grayscale inputs
    round-trip bit-exactly (the q76 oracle window)."""
    if quant is None:
        quant = np.full((8, 8), 16, dtype=np.int32)
        quant[0, 0] = 8
    quant = np.asarray(quant, dtype=np.int32)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [_pad_to_blocks(px.astype(np.float64))]
    else:
        rgb = px.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = np.round(0.299 * r + 0.587 * g + 0.114 * b)
        cb = np.round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128)
        cr = np.round(0.5 * r - 0.418688 * g - 0.081312 * b + 128)
        planes = [
            _pad_to_blocks(np.clip(p, 0, 255)) for p in (y, cb, cr)
        ]
    dc_bits, dc_vals = _fixed_huff_spec(_DC_SYMBOLS)
    ac_bits, ac_vals = _fixed_huff_spec(_AC_SYMBOLS)
    dc_enc = _encode_table(dc_bits, dc_vals)
    ac_enc = _encode_table(ac_bits, ac_vals)

    out = bytearray(b"\xff\xd8")  # SOI

    def segment(marker: int, body: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]) + struct.pack(">H", len(body) + 2))
        out.extend(body)

    zz_q = quant.reshape(64)[_ZIGZAG].astype(np.uint8)
    segment(0xDB, bytes([0x00]) + zz_q.tobytes())  # DQT table 0
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0])
    segment(0xC0, sof)
    segment(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)  # DC table 0
    segment(0xC4, bytes([0x10]) + bytes(ac_bits) + ac_vals)  # AC table 0
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    segment(0xDA, sos)

    writer = _BitWriter()
    preds = [0] * ncomp
    bh, bw = planes[0].shape[0] // 8, planes[0].shape[1] // 8
    for by in range(bh):
        for bx in range(bw):
            for ci in range(ncomp):
                sub = planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                preds[ci] = _encode_blocks(
                    writer, sub, quant, dc_enc, ac_enc, preds[ci]
                )
    out.extend(writer.flush())
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
