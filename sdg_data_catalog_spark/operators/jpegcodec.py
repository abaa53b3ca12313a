"""Self-contained baseline JPEG codec (decode + encode), stdlib + numpy.

Closes the round-3 codec-breadth gap: the container ships no Pillow, so
JPEG payloads previously dead-ended in ``NotImplementedError``
(operators/multimodal.py:160). This module implements the baseline
sequential DCT process of ITU-T T.81 — enough to decode real-world
baseline JFIF files and to emit spec-conformant files other decoders read:

* **decode**: SOF0/SOF1/SOF2 (baseline + extended sequential +
  progressive, 8-bit), arbitrary 1-2× chroma subsampling (4:4:4 / 4:2:2 /
  4:2:0 / grey), Huffman tables from the stream's own DHT segments,
  restart markers (DRI/RSTn), byte stuffing, JFIF/EXIF APPn skipping.
  Progressive scans (spectral selection + successive approximation,
  T.81 G.2 — added round 6, closing the codec tail) accumulate into
  coefficient stores and reconstruct at EOI. Only arithmetic coding and
  hierarchical/lossless processes remain rejected with a clear error.
* **encode**: baseline 4:4:4 (or single-component grey) via
  ``jpeg_encode``; progressive SOF2 via ``jpeg_encode_progressive`` (the
  standard DC/AC successive-approximation ladder, per-block EOB flush so
  the Annex-K typical tables suffice). Annex-K example quantization
  tables scaled by an IJG-style quality knob. Deterministic bytes —
  differential tests can recompute payloads exactly on any host, and the
  progressive and baseline encodings of the same array must decode to
  IDENTICAL pixels.

All table constants below are from the public spec (ITU-T T.81 Annex K).
DCT is the orthonormal 8×8 DCT-II as two matrix products — vectorized
numpy, no per-pixel Python in the transform.

Reference analog: none — the reference has no image path at all; this is
north-star "multimodal columns" surface (SURVEY §2.11).
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants (ITU-T T.81 Annex K) -----------------------------------

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# Typical Huffman tables, T.81 Annex K.3 — (bits[1..16], values).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
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
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
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
    0xF9, 0xFA,
]

assert sum(AC_LUMA_BITS) == len(AC_LUMA_VALS) == 162
assert sum(AC_CHROMA_BITS) == len(AC_CHROMA_VALS) == 162


def _zigzag_order() -> list[tuple[int, int]]:
    """(row, col) pairs in JPEG zigzag order, generated (not transcribed)."""
    order: list[tuple[int, int]] = []
    for s in range(15):
        ii = range(max(0, s - 7), min(s, 7) + 1)
        diag = [(i, s - i) for i in ii]
        order.extend(reversed(diag) if s % 2 == 0 else diag)
    return order


ZIGZAG = _zigzag_order()  # natural (r, c) for zigzag index k
assert ZIGZAG[:6] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2)]
_ZZ_ROWS = np.array([r for r, _ in ZIGZAG])
_ZZ_COLS = np.array([c for _, c in ZIGZAG])


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    k = n[:, None]
    c = np.cos((2 * n[None, :] + 1) * k * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0] *= np.sqrt(0.5)
    return c


_DCT = _dct_matrix()  # orthonormal: spatial = _DCT.T @ coeff @ _DCT


def _build_huffman_decode(bits: list[int], vals: list[int]) -> dict:
    """Canonical code assignment per T.81 C.2 → {(length, code): symbol}."""
    table, code, idx = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[idx]
            idx += 1
            code += 1
        code <<= 1
    return table


def _build_huffman_encode(bits: list[int], vals: list[int]) -> dict:
    return {
        sym: (length, code)
        for (length, code), sym in _build_huffman_decode(bits, vals).items()
    }


# --- decoder ----------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-unstuffing; stops (and byte-aligns) at any non-stuffing marker."""

    __slots__ = ("data", "pos", "bitbuf", "bitcnt", "marker")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.bitcnt = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        if self.pos >= len(self.data):
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:  # real marker (RSTn / EOI / ...) — do not consume here
                self.marker = nxt
                return False
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.bitcnt += 8
        return True

    def read_bits(self, n: int) -> int:
        while self.bitcnt < n:
            if not self._fill():
                # spec: pad with 1-bits at segment end
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.bitcnt += 8
        self.bitcnt -= n
        out = (self.bitbuf >> self.bitcnt) & ((1 << n) - 1)
        self.bitbuf &= (1 << self.bitcnt) - 1
        return out

    def decode_symbol(self, table: dict) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bits(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def restart(self) -> None:
        """Consume an RSTn marker and realign (called between intervals).

        The marker may already have been sighted by ``_fill`` (self.marker
        set) or still be sitting unread at ``pos`` — handle both."""
        self.bitbuf = 0
        self.bitcnt = 0
        if self.marker is None and (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.marker = self.data[self.pos + 1]
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2  # skip FF Dn
            self.marker = None


def _extend(value: int, size: int) -> int:
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline / extended-sequential / progressive (SOF0/1/2)
    Huffman JFIF to uint8 (H, W[, 3]) RGB. Progressive scans (spectral
    selection + successive approximation, ITU-T T.81 G.2) accumulate into
    per-component coefficient stores and reconstruct at EOI."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None  # (h, w, components)
    restart_interval = 0
    progressive = False
    coefs = None  # per-component zigzag coefficient stores (progressive)
    geom = None
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT — may hold several tables
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    vals = np.frombuffer(seg[p : p + 64], np.uint8).astype(np.int32)
                    p += 64
                else:  # 16-bit table
                    vals = np.frombuffer(seg[p : p + 128], ">u2").astype(np.int32)
                    p += 128
                tbl = np.zeros((8, 8), np.int32)
                tbl[_ZZ_ROWS, _ZZ_COLS] = vals
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT — may hold several tables
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                huff[(tc, th)] = _build_huffman_decode(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0 / SOF1 / SOF2
            progressive = marker == 0xC2
            depth, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if depth != 8:
                raise ValueError(f"unsupported JPEG bit depth {depth}")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = (h, w, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (SOF marker 0xFF{marker:02X}); "
                "this codec reads baseline/extended-sequential/progressive "
                "Huffman only"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the segment
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            if not progressive:
                scan = {}
                for i in range(ns):
                    cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                    scan[cs] = (tables >> 4, tables & 0xF)
                return _decode_scan(
                    data, pos + seglen, frame, qt, huff, scan, restart_interval
                )
            scomps = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scomps.append((cs, tables >> 4, tables & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if coefs is None:
                coefs, geom = _alloc_coef_stores(frame)
            pos = _progressive_scan(
                data, pos + seglen, frame, huff, scomps,
                ss, se, ahal >> 4, ahal & 0xF, restart_interval, coefs, geom,
            )
            continue
        pos += seglen
    if progressive and coefs is not None:
        return _reconstruct_coefs(frame, qt, coefs, geom)
    raise ValueError("JPEG contained no scan")


def _alloc_coef_stores(frame):
    """Per-component zigzag coefficient arrays sized to the interleaved
    MCU grid (padding blocks included, so interleaved DC scans can write
    them), plus the shared geometry tuple."""
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    coefs = [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), np.int32) for c in comps
    ]
    return coefs, (hmax, vmax, mcus_x, mcus_y)


def _ac_first(reader, tbl, coef, ss, se, al, eobrun):
    """Progressive AC initial scan for one block's band (T.81 G.1.2.2 /
    classic decode_mcu_AC_first shape). Returns the updated EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = reader.decode_symbol(tbl)
        r, s = sym >> 4, sym & 0xF
        if s:
            k += r
            if k > se:
                raise ValueError("JPEG progressive AC index overflow")
            coef[k] = _extend(reader.read_bits(s), s) << al
        elif r == 15:
            k += 15  # ZRL: 16 zeros with the loop increment
        else:
            eobrun = 1 << r
            if r:
                eobrun += reader.read_bits(r)
            return eobrun - 1  # this block is a member of the EOB run
        k += 1
    return 0


def _ac_refine(reader, tbl, coef, ss, se, al, eobrun):
    """Progressive AC refinement for one block's band (T.81 G.1.2.3 /
    classic decode_mcu_AC_refine shape): newly nonzero coefficients
    arrive as ±1<<al; already-nonzero ones receive a correction bit.
    Returns the updated EOB run."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = reader.decode_symbol(tbl)
            r, s = sym >> 4, sym & 0xF
            if s:
                if s != 1:
                    raise ValueError("bad progressive AC refinement symbol")
                s = p1 if reader.read_bits(1) else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.read_bits(r)
                break  # rest of the band is EOB-run territory below
            # advance over r still-zero coefs, correcting nonzero ones
            while k <= se:
                if coef[k] != 0:
                    if reader.read_bits(1) and (int(coef[k]) & p1) == 0:
                        coef[k] += p1 if coef[k] >= 0 else m1
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if s and k <= se:
                coef[k] = s
            k += 1
    if eobrun > 0:
        while k <= se:  # correction bits through the rest of the band
            if coef[k] != 0:
                if reader.read_bits(1) and (int(coef[k]) & p1) == 0:
                    coef[k] += p1 if coef[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _progressive_scan(data, pos, frame, huff, scomps, ss, se, ah, al,
                      restart_interval, coefs, geom):
    """Decode one progressive scan into the coefficient stores; returns
    the stream position of the marker that ended the scan. Interleaved
    scans (ns > 1) are DC-only per T.81; AC scans are single-component
    and traverse that component's own block raster."""
    h, w, comps = frame
    hmax, vmax, mcus_x, mcus_y = geom
    idx = {c["id"]: ci for ci, c in enumerate(comps)}
    reader = _BitReader(data, pos)
    eobrun = 0
    if len(scomps) == 1:
        cid, td, ta = scomps[0]
        ci = idx[cid]
        c = comps[ci]
        # non-interleaved geometry: ceil(ceil(dim·samp/max)/8)
        nb_w = -(-(-(-w * c["h"] // hmax)) // 8)
        nb_h = -(-(-(-h * c["v"] // vmax)) // 8)
        tbl = huff.get((0, td)) if ss == 0 else huff.get((1, ta))
        if tbl is None and not (ss == 0 and ah > 0):
            raise ValueError("JPEG scan references a missing Huffman table")
        dc_pred = 0
        n = 0
        for by in range(nb_h):
            for bx in range(nb_w):
                if restart_interval and n and n % restart_interval == 0:
                    reader.restart()
                    dc_pred, eobrun = 0, 0
                coef = coefs[ci][by, bx]
                if ss == 0:
                    if ah == 0:
                        size = reader.decode_symbol(tbl)
                        dc_pred += _extend(reader.read_bits(size), size)
                        coef[0] = dc_pred << al
                    elif reader.read_bits(1):
                        coef[0] |= 1 << al
                elif ah == 0:
                    eobrun = _ac_first(reader, tbl, coef, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine(reader, tbl, coef, ss, se, al, eobrun)
                n += 1
    else:
        if ss != 0:
            raise ValueError("interleaved progressive scans must be DC-only")
        dc_pred = {cid: 0 for cid, _, _ in scomps}
        n = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and n and n % restart_interval == 0:
                    reader.restart()
                    dc_pred = {cid: 0 for cid, _, _ in scomps}
                for cid, td, _ta in scomps:
                    ci = idx[cid]
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coef = coefs[ci][my * c["v"] + by, mx * c["h"] + bx]
                            if ah == 0:
                                tbl = huff[(0, td)]
                                size = reader.decode_symbol(tbl)
                                dc_pred[cid] += _extend(
                                    reader.read_bits(size), size
                                )
                                coef[0] = dc_pred[cid] << al
                            elif reader.read_bits(1):
                                coef[0] |= 1 << al
                n += 1
    return reader.pos


def _reconstruct_coefs(frame, qt, coefs, geom):
    """Dequantize + IDCT the accumulated coefficient stores and assemble
    the image — the progressive twin of _decode_scan's per-block tail,
    vectorized over all blocks at once."""
    h, w, comps = frame
    hmax, vmax, _mx, _my = geom
    full = []
    for ci, c in enumerate(comps):
        zz = coefs[ci].astype(np.float64)  # (by, bx, 64)
        by, bx = zz.shape[:2]
        blocks = np.zeros((by, bx, 8, 8), np.float64)
        blocks[:, :, _ZZ_ROWS, _ZZ_COLS] = zz
        blocks *= qt[c["tq"]]
        spatial = np.einsum("ij,abjk,kl->abil", _DCT.T, blocks, _DCT) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        full.append(plane[:h, :w])
    if len(comps) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_scan(data, pos, frame, qt, huff, scan, restart_interval):
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), np.float64)
        )
    reader = _BitReader(data, pos)
    dc_pred = [0] * len(comps)
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                reader.restart()
                dc_pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_tbl = huff[(0, scan[c["id"]][0])]
                ac_tbl = huff[(1, scan[c["id"]][1])]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, np.int32)
                        size = reader.decode_symbol(dc_tbl)
                        dc_pred[ci] += _extend(reader.read_bits(size), size)
                        zz[0] = dc_pred[ci]
                        k = 1
                        while k < 64:
                            sym = reader.decode_symbol(ac_tbl)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if size == 0:
                                if run != 15:
                                    raise ValueError("bad JPEG AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _extend(reader.read_bits(size), size)
                            k += 1
                        block = np.zeros((8, 8), np.float64)
                        block[_ZZ_ROWS, _ZZ_COLS] = zz
                        block *= q
                        spatial = _DCT.T @ block @ _DCT + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_index += 1
    # upsample to full resolution and crop
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- encoder ----------------------------------------------------------


class _BitWriter:
    __slots__ = ("out", "bitbuf", "bitcnt")

    def __init__(self):
        self.out = bytearray()
        self.bitbuf = 0
        self.bitcnt = 0

    def write(self, code: int, length: int) -> None:
        self.bitbuf = (self.bitbuf << length) | code
        self.bitcnt += length
        while self.bitcnt >= 8:
            self.bitcnt -= 8
            b = (self.bitbuf >> self.bitcnt) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.bitbuf &= (1 << self.bitcnt) - 1

    def flush(self) -> None:
        if self.bitcnt:
            pad = 8 - self.bitcnt
            self.write((1 << pad) - 1, pad)  # 1-bit padding per spec


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, raw-bits) for a DC diff / AC coefficient per T.81 F.1.2."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    raw = v if v >= 0 else v + (1 << size) - 1
    return size, raw


def _encode_component_block(
    writer, block, q, dc_pred, dc_enc, ac_enc
) -> int:
    coeff = _DCT @ (block - 128.0) @ _DCT.T
    zz = np.round(coeff / q)[_ZZ_ROWS, _ZZ_COLS].astype(np.int64)
    diff = int(zz[0]) - dc_pred
    size, raw = _magnitude(diff)
    length, code = dc_enc[size]
    writer.write(code, length)
    if size:
        writer.write(raw, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_enc[0xF0]
            writer.write(code, length)
            run -= 16
        size, raw = _magnitude(v)
        length, code = ac_enc[(run << 4) | size]
        writer.write(code, length)
        writer.write(raw, size)
        run = 0
    if last < 63:
        length, code = ac_enc[0x00]
        writer.write(code, length)
    return int(zz[0])


def jpeg_encode(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode a uint8 (H, W) grey or (H, W, 3) RGB array as baseline JFIF.

    ``subsampling``: "444" (no chroma downsample) or "420" (2×2 box-mean
    chroma, the common camera/web default — also exercises the decoder's
    multi-block MCU + upsample path). ``restart_interval`` > 0 emits DRI +
    RSTn markers every that-many MCUs (exercises the decoder's restart
    resync). Deterministic bytes for given (array, quality, options).
    """
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("jpeg_encode expects uint8")
    grey = arr.ndim == 2
    if not grey and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"unsupported array shape {arr.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = arr.shape[:2]
    ql = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)
    sub = subsampling == "420" and not grey
    if grey:
        planes = [arr.astype(np.float64)]
        qtabs, samp = [ql], [(1, 1)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if sub:
            # pad to even, then 2×2 box-mean downsample the chroma planes
            eh, ew = -(-h // 2) * 2, -(-w // 2) * 2
            cb = np.pad(cb, ((0, eh - h), (0, ew - w)), mode="edge")
            cr = np.pad(cr, ((0, eh - h), (0, ew - w)), mode="edge")
            cb = cb.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qtabs = [ql, qc, qc]
    ncomp = len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # pad each plane to its own MCU-grid size by edge replication
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        th, tw = mcus_y * sv * 8, mcus_x * sh * 8
        padded.append(
            np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        )
    planes = padded

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 1, 1
    ) + b"\x00\x00"
    for tq, tbl in ((0, ql),) if grey else ((0, ql), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(tbl[r, c]) for r, c in ZIGZAG)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for i in range(ncomp):
        sh, sv = samp[i]
        out += bytes([i + 1, (sh << 4) | sv, 0 if i == 0 else 1])
    tables = [
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
    ]
    if not grey:
        tables += [
            (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc, th, bits, vals in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for i in range(ncomp):
        out += bytes([i + 1, 0x00 if i == 0 else 0x11])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    dc_l = _build_huffman_encode(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_huffman_encode(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_huffman_encode(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_huffman_encode(AC_CHROMA_BITS, AC_CHROMA_VALS)
    enc = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (ncomp - 1)

    writer = _BitWriter()
    dc_pred = [0] * ncomp
    mcu_index = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                dc_pred = [0] * ncomp
            for ci in range(ncomp):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = planes[ci][y0 : y0 + 8, x0 : x0 + 8]
                        dc_pred[ci] = _encode_component_block(
                            writer, block, qtabs[ci], dc_pred[ci], *enc[ci]
                        )
            mcu_index += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- progressive encoder ------------------------------------------------


def _enc_dc_first(writer, dc_enc, dc, pred, al):
    """DC initial scan: encode (dc >> al) - pred; returns the new pred."""
    t = int(dc) >> al  # arithmetic shift — the spec's DC point transform
    size, raw = _magnitude(t - pred)
    length, code = dc_enc[size]
    writer.write(code, length)
    if size:
        writer.write(raw, size)
    return t


def _enc_ac_first(writer, ac_enc, zz, ss, se, al):
    """AC initial scan for one block's band. EOB runs are flushed per
    block (EOB0 only), so the Annex-K typical tables — which carry no
    EOBn>0 codes — suffice."""
    run = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = (-v if v < 0 else v) >> al
        if t == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_enc[0xF0]
            writer.write(code, length)
            run -= 16
        size, raw = _magnitude(t if v >= 0 else -t)
        length, code = ac_enc[(run << 4) | size]
        writer.write(code, length)
        writer.write(raw, size)
        run = 0
    if run > 0:
        length, code = ac_enc[0x00]  # EOB0
        writer.write(code, length)


def _enc_ac_refine(writer, ac_enc, zz, ss, se, al):
    """AC refinement scan for one block's band (T.81 G.2 / classic
    encode_mcu_AC_refine shape): newly nonzero coefficients emit a
    (run,1) symbol + sign bit; already-nonzero ones buffer a correction
    bit appended after the next emitted symbol. Per-block EOB0 flush."""
    absv = []
    eob = ss - 1  # position of the last newly-nonzero coefficient
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = (-v if v < 0 else v) >> al
        absv.append(t)
        if t == 1:
            eob = k
    run = 0
    br: list[int] = []
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            run += 1
            continue
        while run > 15 and k <= eob:
            length, code = ac_enc[0xF0]
            writer.write(code, length)
            run -= 16
            for bit in br:
                writer.write(bit, 1)
            br = []
        if t > 1:  # already nonzero at the prior precision
            br.append(t & 1)
            continue
        length, code = ac_enc[(run << 4) | 1]
        writer.write(code, length)
        writer.write(0 if int(zz[k]) < 0 else 1, 1)
        for bit in br:
            writer.write(bit, 1)
        br = []
        run = 0
    if run > 0 or br:
        length, code = ac_enc[0x00]  # EOB0 + trailing correction bits
        writer.write(code, length)
        for bit in br:
            writer.write(bit, 1)


def jpeg_encode_progressive(arr: np.ndarray, quality: int = 90) -> bytes:
    """Encode a uint8 (H, W) grey or (H, W, 3) RGB array as PROGRESSIVE
    JFIF (SOF2), 4:4:4 / single-component only. Scan script (the standard
    two-level successive-approximation ladder):

      1. DC initial, all components interleaved, Al=1
      2. DC refinement, interleaved, Ah=1 Al=0
      3. per component: AC initial   Ss=1 Se=63 Al=1
      4. per component: AC refinement Ss=1 Se=63 Ah=1 Al=0

    Coefficients are identical to the baseline encoder's at the same
    quality, so `jpeg_decode(jpeg_encode_progressive(x))` must equal
    `jpeg_decode(jpeg_encode(x))` EXACTLY — the differential contract
    tests/test_jpegcodec.py pins."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("jpeg_encode_progressive expects uint8")
    grey = arr.ndim == 2
    if not grey and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    ql = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)
    if grey:
        planes, qtabs = [arr.astype(np.float64)], [ql]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        qtabs = [ql, qc, qc]
    ncomp = len(planes)
    nb_x, nb_y = -(-w // 8), -(-h // 8)
    # quantized zigzag coefficients for every block of every component
    zz_all = []
    for p, q in zip(planes, qtabs):
        p = np.pad(p, ((0, nb_y * 8 - h), (0, nb_x * 8 - w)), mode="edge")
        zz = np.empty((nb_y, nb_x, 64), np.int64)
        for by in range(nb_y):
            for bx in range(nb_x):
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coeff = _DCT @ (block - 128.0) @ _DCT.T
                zz[by, bx] = np.round(coeff / q)[_ZZ_ROWS, _ZZ_COLS]
        zz_all.append(zz)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, tbl in ((0, ql),) if grey else ((0, ql), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(tbl[r, c]) for r, c in ZIGZAG)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for i in range(ncomp):
        out += bytes([i + 1, 0x11, 0 if i == 0 else 1])
    tables = [(0, 0, DC_LUMA_BITS, DC_LUMA_VALS), (1, 0, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not grey:
        tables += [
            (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc, th, bits, vals in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    dc_enc = [_build_huffman_encode(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_enc = [_build_huffman_encode(AC_LUMA_BITS, AC_LUMA_VALS)]
    if not grey:
        dc_enc += [_build_huffman_encode(DC_CHROMA_BITS, DC_CHROMA_VALS)] * 2
        ac_enc += [_build_huffman_encode(AC_CHROMA_BITS, AC_CHROMA_VALS)] * 2

    def sos_header(comps_spec, ss, se, ah, al):
        hdr = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps_spec), len(comps_spec))
        for cid, td, ta in comps_spec:
            hdr += bytes([cid, (td << 4) | ta])
        return hdr + bytes([ss, se, (ah << 4) | al])

    # scan 1: DC initial, interleaved, Al=1
    out += sos_header([(i + 1, 0 if i == 0 else 1, 0) for i in range(ncomp)], 0, 0, 0, 1)
    wtr = _BitWriter()
    pred = [0] * ncomp
    for by in range(nb_y):
        for bx in range(nb_x):
            for ci in range(ncomp):
                pred[ci] = _enc_dc_first(wtr, dc_enc[ci], zz_all[ci][by, bx, 0], pred[ci], 1)
    wtr.flush()
    out += wtr.out
    # scan 2: DC refinement, interleaved, Ah=1 Al=0 (raw bits, no tables)
    out += sos_header([(i + 1, 0, 0) for i in range(ncomp)], 0, 0, 1, 0)
    wtr = _BitWriter()
    for by in range(nb_y):
        for bx in range(nb_x):
            for ci in range(ncomp):
                wtr.write(int(zz_all[ci][by, bx, 0]) & 1, 1)
    wtr.flush()
    out += wtr.out
    # scans 3/4 per component: AC initial (Al=1) then AC refinement (Ah=1 Al=0)
    for ci in range(ncomp):
        ta = 0 if ci == 0 else 1
        out += sos_header([(ci + 1, 0, ta)], 1, 63, 0, 1)
        wtr = _BitWriter()
        for by in range(nb_y):
            for bx in range(nb_x):
                _enc_ac_first(wtr, ac_enc[ci], zz_all[ci][by, bx], 1, 63, 1)
        wtr.flush()
        out += wtr.out
        out += sos_header([(ci + 1, 0, ta)], 1, 63, 1, 0)
        wtr = _BitWriter()
        for by in range(nb_y):
            for bx in range(nb_x):
                _enc_ac_refine(wtr, ac_enc[ci], zz_all[ci][by, bx], 1, 63, 0)
        wtr.flush()
        out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
