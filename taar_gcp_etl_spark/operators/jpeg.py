"""Baseline JPEG (SOF0) decoder — numpy + stdlib only, no codec library.

Closes the last image-format gap in the multimodal path (NEXT.md r5 #3
claimed JPEG "genuinely needs Pillow" — baseline sequential JPEG does
not): SOI/APPn/DQT/DHT/SOF0/DRI/SOS marker parse, canonical Huffman
decode with byte-stuffing and restart intervals, zigzag + dequantize,
8x8 IDCT (one orthonormal basis matmul per block), chroma upsampling
for integral sampling factors, and BT.601 YCbCr→RGB. Grayscale (1
component) and YCbCr (3 components) both normalize to (h, w, 3) uint8
RGB — the decode_pixels contract.

Explicitly rejected with ValueError (honest scope, not silent garbage):
progressive (SOF2) and the other non-baseline frame types, arithmetic
coding, hierarchical, and 4-component CMYK scans.

Execution model: called per-blob inside Arrow-batched mapInPandas on
executors (see operators/multimodal.py). Entropy decoding is inherently
bit-serial, so this is a Python-speed decode — the right shape for the
metadata/dedup pipelines this engine runs (perceptual hashing, feature
extraction), with the per-partition parallelism coming from Spark, not
the codec. Corrupt blobs raise into multimodal.DECODE_ERRORS and drop.
"""

from __future__ import annotations

import struct

import numpy as np


def _zigzag_natural() -> list[int]:
    """k-th zigzag position → natural (row*8+col) index, generated from
    the spec's traversal rule rather than hand-typed (the real-encoder
    fixture test cross-checks it)."""
    out = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        rows = reversed(rng) if s % 2 == 0 else rng
        out.extend(r * 8 + (s - r) for r in rows)
    return out


_ZZ = _zigzag_natural()

# orthonormal 8-point DCT-II basis: spatial = A.T @ coefs @ A
_A = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _build_huffman(bits: list[int], vals: bytes) -> dict:
    """Canonical Huffman table → {(length, code): symbol}."""
    lut, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lut[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return lut


class _Bits:
    """MSB-first bit reader over one entropy-coded segment (byte
    stuffing already stripped by the scan splitter)."""

    __slots__ = ("buf", "i", "acc", "n")

    def __init__(self, buf: bytes):
        self.buf, self.i, self.acc, self.n = buf, 0, 0, 0

    def bit(self) -> int:
        if self.n == 0:
            if self.i >= len(self.buf):
                raise ValueError("JPEG: truncated entropy-coded data")
            self.acc = self.buf[self.i]
            self.i += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, lut: dict) -> int:
        ln = code = 0
        while ln < 16:
            code = (code << 1) | self.bit()
            ln += 1
            sym = lut.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid huffman code")


def _extend(v: int, s: int) -> int:
    """Spec EXTEND: map an s-bit magnitude to its signed value."""
    if s and v < (1 << (s - 1)):
        return v - (1 << s) + 1
    return v


def _split_scan(data: bytes, start: int):
    """Entropy-coded segments of one scan, split at restart markers,
    0xFF00 stuffing removed. Returns (segments, index of the marker
    that ended the scan)."""
    segs, cur, i = [], bytearray(), start
    while i < len(data):
        b = data[i]
        if b == 0xFF:
            m = data[i + 1] if i + 1 < len(data) else 0xD9
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:  # RSTn
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or any other marker ends the scan
        cur.append(b)
        i += 1
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(content: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes to an (h, w, 3) uint8 RGB array."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huf: dict[tuple[int, int], dict] = {}  # (class, id) -> lut
    restart = 0
    frame = None
    planes = None
    i = 2
    n = len(content)
    while i < n:
        if content[i] != 0xFF:
            raise ValueError("JPEG: expected marker")
        while i < n and content[i] == 0xFF:  # fill bytes allowed
            i += 1
        m = content[i]
        i += 1
        if m == 0xD9:  # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            continue
        (ln,) = struct.unpack(">H", content[i : i + 2])
        seg = content[i + 2 : i + ln]
        if m == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    vals = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.float64)
                    p += 128
                else:
                    vals = np.frombuffer(
                        seg[p : p + 64], dtype=np.uint8
                    ).astype(np.float64)
                    p += 64
                qt[tq] = vals  # zigzag order, as transmitted
        elif m == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                huf[(tc, th)] = _build_huffman(
                    bits, seg[p + 17 : p + 17 + nv]
                )
                p += 17 + nv
        elif m in (0xC0, 0xC1):  # baseline / extended sequential
            prec = seg[0]
            if prec != 8:
                raise ValueError(f"JPEG: {prec}-bit precision unsupported")
            h_img, w_img = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if nc not in (1, 3):
                raise ValueError(f"JPEG: {nc}-component scan unsupported")
            comps = []
            for c in range(nc):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append(
                    {
                        "id": cid,
                        "h": hv >> 4,
                        "v": hv & 15,
                        "tq": seg[8 + 3 * c],
                    }
                )
            frame = (h_img, w_img, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError(
                "JPEG: only baseline sequential (SOF0/SOF1) supported"
            )
        elif m == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            h_img, w_img, comps = frame
            ns = seg[0]
            tables = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                tables[cid] = (tt >> 4, tt & 15)
            segs, i = _split_scan(content, i + ln)
            planes = _decode_scan(
                comps, tables, qt, huf, segs, restart, h_img, w_img
            )
            continue  # i already advanced past the scan
        i += ln
    if planes is None or frame is None:
        raise ValueError("JPEG: no decoded scan")
    return _to_rgb(planes, frame)


def _decode_scan(comps, tables, qt, huf, segs, restart, h_img, w_img):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
    ]
    # dequant tables in natural order, indexed [natural] = q[zigzag k]
    deq = {}
    for c in comps:
        q = qt[c["tq"]]
        nat = np.zeros(64)
        nat[_ZZ] = q
        deq[c["tq"]] = nat
    pred = [0] * len(comps)
    seg_iter = iter(segs)
    bits = _Bits(next(seg_iter))
    for mcu in range(mcux * mcuy):
        if restart and mcu and mcu % restart == 0:
            bits = _Bits(next(seg_iter))
            pred = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, c in enumerate(comps):
            dc_lut = huf[(0, tables[c["id"]][0])]
            ac_lut = huf[(1, tables[c["id"]][1])]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coef = np.zeros(64)
                    s = bits.huff(dc_lut)
                    diff = _extend(bits.bits(s), s) if s else 0
                    pred[ci] += diff
                    coef[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = bits.huff(ac_lut)
                        r, sz = rs >> 4, rs & 15
                        if sz == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG: AC index overflow")
                        coef[_ZZ[k]] = _extend(bits.bits(sz), sz)
                        k += 1
                    block = (coef * deq[c["tq"]]).reshape(8, 8)
                    spatial = _A.T @ block @ _A
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
    return planes


def _to_rgb(planes, frame):
    h_img, w_img, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    up = []
    for c, p in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if vmax % c["v"] or hmax % c["h"]:
            raise ValueError("JPEG: non-integral sampling ratio")
        if ry > 1:
            p = np.repeat(p, ry, axis=0)
        if rx > 1:
            p = np.repeat(p, rx, axis=1)
        up.append(p[:h_img, :w_img] + 128.0)
    if len(up) == 1:
        g = np.clip(up[0], 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = up
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)
