"""Baseline (SOF0) + progressive (SOF2) JPEG decoder — numpy + stdlib
only, no codec library.

Closes the image-format gap in the multimodal path (NEXT.md r5 #3
claimed JPEG "genuinely needs Pillow" — Huffman-coded JPEG does not):
SOI/APPn/DQT/DHT/SOF/DRI/SOS marker parse, canonical Huffman decode
with byte-stuffing and restart intervals, zigzag + dequantize, 8x8 IDCT
(one orthonormal basis matmul per block), chroma upsampling for
integral sampling factors, and BT.601 YCbCr→RGB. Grayscale (1
component) and YCbCr (3 components) both normalize to (h, w, 3) uint8
RGB — the decode_pixels contract.

Progressive (SOF2, round-6 backlog #3) accumulates dequantizable
coefficients across scans — DC first/refinement (interleaved or not),
AC first scans with EOB-run coding, and AC successive-approximation
refinement with correction bits (the libjpeg decode_mcu_AC_refine
algorithm, rebuilt from ITU-T.81 §G.2) — then reconstructs with one
vectorized IDCT over every block. The scan-script is not assumed:
any spectral-selection/approximation split the spec allows decodes.

Explicitly rejected with ValueError (honest scope, not silent garbage):
lossless and the other non-baseline frame types, arithmetic coding,
hierarchical, 12-bit precision, and 4-component CMYK scans.

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


def _req(d, key, what):
    """Table lookup that converts a missing id into the decoder's
    documented clean-rejection path (ValueError) instead of a KeyError
    escaping multimodal.DECODE_ERRORS on a corrupt stream."""
    try:
        return d[key]
    except KeyError:
        raise ValueError(f"JPEG: scan references undefined {what} {key!r}")


def _next_seg(seg_iter):
    """Next entropy segment, or clean rejection when a restart-interval
    stream carries fewer segments than MCUs (StopIteration would
    otherwise PEP-479-convert to RuntimeError inside mapInPandas)."""
    try:
        return next(seg_iter)
    except StopIteration:
        raise ValueError("JPEG: truncated entropy stream (missing segment)")

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
    """Decode baseline or progressive JPEG bytes to an (h, w, 3) uint8
    RGB array."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huf: dict[tuple[int, int], dict] = {}  # (class, id) -> lut
    restart = 0
    frame = None
    planes = None
    progressive = False
    coefs: list[np.ndarray] | None = None  # per-comp (by, bx, 64) zigzag
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
        elif m in (0xC0, 0xC1, 0xC2):  # baseline / ext. seq. / progressive
            progressive = m == 0xC2
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
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError(
                "JPEG: only sequential (SOF0/SOF1) and progressive "
                "(SOF2) supported"
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
            if progressive:
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahl = seg[3 + 2 * ns]
                ah, al = ahl >> 4, ahl & 15
                if coefs is None:
                    coefs = _alloc_coefs(comps, h_img, w_img)
                segs, i = _split_scan(content, i + ln)
                scan_cids = [seg[1 + 2 * c] for c in range(ns)]
                _decode_prog_scan(
                    comps, scan_cids, tables, huf, segs, restart,
                    coefs, ss, se, ah, al, h_img, w_img,
                )
            else:
                # baseline _decode_scan iterates every frame component
                # per MCU; a scan over a subset (spec-valid multi-scan
                # non-interleaved sequential) would mis-decode — reject
                # cleanly, mirroring the progressive path's explicit
                # scan-subset handling.
                if ns != len(comps):
                    raise ValueError(
                        "JPEG: non-interleaved sequential scans unsupported"
                    )
                segs, i = _split_scan(content, i + ln)
                planes = _decode_scan(
                    comps, tables, qt, huf, segs, restart, h_img, w_img
                )
            continue  # i already advanced past the scan
        i += ln
    if progressive and coefs is not None:
        planes = _prog_reconstruct(frame, qt, coefs)
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
        q = _req(qt, c["tq"], "quant table")
        nat = np.zeros(64)
        nat[_ZZ] = q
        deq[c["tq"]] = nat
    pred = [0] * len(comps)
    seg_iter = iter(segs)
    bits = _Bits(_next_seg(seg_iter))
    for mcu in range(mcux * mcuy):
        if restart and mcu and mcu % restart == 0:
            bits = _Bits(_next_seg(seg_iter))
            pred = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, c in enumerate(comps):
            tt = _req(tables, c["id"], "scan component")
            dc_lut = _req(huf, (0, tt[0]), "DC Huffman table")
            ac_lut = _req(huf, (1, tt[1]), "AC Huffman table")
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


def _alloc_coefs(comps, h_img, w_img) -> list[np.ndarray]:
    """One (blocks_y, blocks_x, 64) int32 array per component, indexed
    in ZIGZAG coefficient order (spectral selection bands are zigzag
    ranges), padded to the MCU grid like the baseline planes."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in comps
    ]


def _comp_blocks(c, h_img, w_img, hmax, vmax) -> tuple[int, int]:
    """Effective (blocks_y, blocks_x) a NON-interleaved scan traverses:
    the component's true sample dims rounded up to whole blocks (spec
    A.2.2 — padding blocks of the MCU grid are skipped)."""
    ch = -(-w_img * c["h"] // hmax)
    cv = -(-h_img * c["v"] // vmax)
    return -(-cv // 8), -(-ch // 8)


def _refine_nonzero(bits: _Bits, coef, k: int, p1: int) -> None:
    """One correction bit for an already-nonzero coefficient (§G.2:
    append the next lower-significance magnitude bit, keeping sign)."""
    if bits.bit() and not (int(coef[k]) & p1):
        coef[k] += p1 if int(coef[k]) >= 0 else -p1


def _decode_prog_scan(
    comps, scan_cids, tables, huf, segs, restart, coefs,
    ss, se, ah, al, h_img, w_img,
):
    """Decode one progressive scan into the persistent coefficient
    arrays. Four scan kinds (ITU-T.81 §G.2): DC first (Ah=0, Ss=0,
    interleaved or single-component), DC refinement (one raw bit per
    block), AC first (single-component, EOB-run coded), AC refinement
    (correction bits + newly-significant ±1<<Al insertions)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))
    by_id = {c["id"]: ci for ci, c in enumerate(comps)}
    if any(cid not in by_id for cid in scan_cids):
        raise ValueError("JPEG: scan references unknown component")
    scan = [(by_id[cid], comps[by_id[cid]]) for cid in scan_cids]
    is_dc = ss == 0
    if not is_dc and len(scan) != 1:
        raise ValueError("JPEG: progressive AC scan must be one component")
    if is_dc and se != 0:
        raise ValueError("JPEG: progressive DC scan with Se != 0")

    seg_iter = iter(segs)
    bits = _Bits(_next_seg(seg_iter))
    pred = [0] * len(comps)
    state = {"eobrun": 0}

    def next_rst():
        nonlocal bits
        bits = _Bits(_next_seg(seg_iter))
        pred[:] = [0] * len(comps)
        state["eobrun"] = 0

    if is_dc and len(scan) > 1:
        # interleaved DC scan: MCU traversal over all components
        for mcu in range(mcux * mcuy):
            if restart and mcu and mcu % restart == 0:
                next_rst()
            my, mx = divmod(mcu, mcux)
            for ci, c in scan:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = coefs[ci][my * c["v"] + by, mx * c["h"] + bx]
                        _dc_block(bits, huf, tables, c, coef, pred, ci,
                                  ah, al)
        return

    # single-component scan (DC or AC): raster over effective blocks
    ci, c = scan[0]
    nby, nbx = _comp_blocks(c, h_img, w_img, hmax, vmax)
    ac_lut = None
    if not is_dc:
        ac_lut = _req(huf, (1, _req(tables, c["id"], "scan component")[1]),
                      "AC Huffman table")
    for blk in range(nby * nbx):
        if restart and blk and blk % restart == 0:
            next_rst()
        by, bx = divmod(blk, nbx)
        coef = coefs[ci][by, bx]
        if is_dc:
            _dc_block(bits, huf, tables, c, coef, pred, ci, ah, al)
        elif ah == 0:
            _ac_first_block(bits, ac_lut, coef, ss, se, al, state)
        else:
            _ac_refine_block(bits, ac_lut, coef, ss, se, al, state)


def _dc_block(bits, huf, tables, c, coef, pred, ci, ah, al):
    if ah == 0:  # first DC scan: normal DPCM, point-transformed
        dc_lut = _req(huf, (0, _req(tables, c["id"], "scan component")[0]),
                      "DC Huffman table")
        s = bits.huff(dc_lut)
        diff = _extend(bits.bits(s), s) if s else 0
        pred[ci] += diff
        coef[0] = pred[ci] << al
    else:  # refinement: one raw bit per block
        if bits.bit():
            coef[0] = int(coef[0]) | (1 << al)


def _ac_first_block(bits, ac_lut, coef, ss, se, al, state):
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = bits.huff(ac_lut)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += bits.bits(r)
            break
        k += r
        if k > se:
            raise ValueError("JPEG: AC index overflow")
        coef[k] = _extend(bits.bits(s), s) << al
        k += 1


def _ac_refine_block(bits, ac_lut, coef, ss, se, al, state):
    """§G.2 successive-approximation AC refinement: zero-history runs
    position newly-significant ±1<<Al coefficients; every nonzero
    coefficient crossed (and, once EOB is reached, every remaining one)
    reads a correction bit."""
    p1 = 1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = bits.huff(ac_lut)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:  # EOBn: run includes this block's tail
                    state["eobrun"] = (1 << r)
                    if r:
                        state["eobrun"] += bits.bits(r)
                    break
                val = 0  # ZRL: 16 zero-history coefs, no insertion
            else:
                if s != 1:
                    raise ValueError("JPEG: AC refine size must be 1")
                val = p1 if bits.bit() else -p1
            while k <= se:
                if int(coef[k]) != 0:
                    _refine_nonzero(bits, coef, k, p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            if int(coef[k]) != 0:
                _refine_nonzero(bits, coef, k, p1)
            k += 1
        state["eobrun"] -= 1


def _prog_reconstruct(frame, qt, coefs):
    """Dequantize + IDCT every accumulated block, vectorized: one
    einsum per component instead of a per-block matmul loop."""
    h_img, w_img, comps = frame
    planes = []
    for c, zzc in zip(comps, coefs):
        deq = zzc.astype(np.float64) * _req(qt, c["tq"], "quant table")
        nat = np.zeros_like(deq)
        nat[..., _ZZ] = deq
        blocks = nat.reshape(*nat.shape[:2], 8, 8)
        spatial = np.einsum("ux,abuv,vy->abxy", _A, blocks, _A)
        nby, nbx = spatial.shape[:2]
        planes.append(
            spatial.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        )
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
