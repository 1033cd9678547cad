"""GIF87a/89a decoder — numpy + stdlib only, no codec library.

Fourth real image codec in the multimodal path (after PPM/BMP, PNG
r4, JPEG r5): header + logical-screen descriptor, global/local color
tables, extension-block skipping (GCE parsed for the transparency
flag), variable-width LSB-first LZW decompression (the GIF variant:
clear/end codes, dictionary growth to 12 bits), 4-pass interlace
de-interleave, palette mapping to (h, w, 3) uint8 RGB — the
decode_pixels contract shared by every codec here.

Scope (explicit, ValueError on violation — corrupt or out-of-scope
blobs drop per-row in multimodal.DECODE_ERRORS, never fail the job):
the FIRST image frame of a possibly-animated stream is decoded and the
rest ignored (the still-image contract the dedup/feature pipelines
need); transparency renders as the palette color (the perceptual-hash
consumers compare content, not compositing).

Execution model: called per-blob inside Arrow-batched mapInPandas on
executors (operators/multimodal.py). LZW is inherently serial per
stream — Python-speed decode, Spark-level parallelism across blobs,
the same shape as operators/jpeg.py.
"""

from __future__ import annotations

import struct

import numpy as np


def _req_len(buf: bytes, end: int, what: str) -> None:
    if len(buf) < end:
        raise ValueError(f"GIF: truncated {what}")


def _sub_blocks(data: bytes, i: int) -> tuple[bytes, int]:
    """Concatenate length-prefixed sub-blocks starting at i; returns
    (payload, index after the 0 terminator)."""
    out = bytearray()
    while True:
        _req_len(data, i + 1, "sub-block length")
        n = data[i]
        i += 1
        if n == 0:
            return bytes(out), i
        _req_len(data, i + n, "sub-block")
        out += data[i : i + n]
        i += n


def _lzw_decode(mcs: int, data: bytes, n_pixels: int) -> bytearray:
    """GIF-variant LZW: variable code width starting at mcs+1 (max 12),
    LSB-first bit packing, CLEAR resets the dictionary, END terminates.
    Decodes at most n_pixels indices (spec allows trailing junk)."""
    if not 2 <= mcs <= 8:  # root codes are palette indices: one byte
        raise ValueError(f"GIF: bad LZW min code size {mcs}")
    clear = 1 << mcs
    end = clear + 1

    out = bytearray()
    # dictionary as a list of byte strings; entries < clear are single
    # indices (valid even beyond the palette — palette lookup validates)
    base = [bytes([c]) for c in range(clear)] + [b"", b""]
    table = list(base)
    width = mcs + 1
    prev: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF: truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF: first LZW code not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF: LZW code beyond dictionary")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise ValueError(
            f"GIF: LZW ended at {len(out)} of {n_pixels} pixels"
        )
    return out[:n_pixels]


def _color_table(data: bytes, i: int, packed: int) -> tuple:
    """(palette (n,3) array or None, next index) from a descriptor's
    packed byte."""
    if not packed & 0x80:
        return None, i
    n = 2 << (packed & 0x07)
    _req_len(data, i + 3 * n, "color table")
    pal = np.frombuffer(data[i : i + 3 * n], dtype=np.uint8).reshape(
        n, 3
    )
    return pal, i + 3 * n


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(content: bytes) -> np.ndarray:
    """Decode GIF bytes to an (h, w, 3) uint8 RGB array (first frame)."""
    _req_len(content, 13, "header")
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (missing signature)")
    sw, sh = struct.unpack("<HH", content[6:10])
    packed = content[10]
    i = 13
    gct, i = _color_table(content, i, packed)

    while True:
        _req_len(content, i + 1, "block")
        b = content[i]
        i += 1
        if b == 0x3B:  # trailer before any image
            raise ValueError("GIF: no image data")
        if b == 0x21:  # extension: label + sub-blocks, all skippable
            _req_len(content, i + 1, "extension label")
            i += 1
            _, i = _sub_blocks(content, i)
            continue
        if b != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{b:02x}")
        break

    _req_len(content, i + 9, "image descriptor")
    left, top, w, h = struct.unpack("<HHHH", content[i : i + 8])
    ipacked = content[i + 8]
    i += 9
    if w == 0 or h == 0:
        raise ValueError("GIF: empty image")
    lct, i = _color_table(content, i, ipacked)
    pal = lct if lct is not None else gct
    if pal is None:
        raise ValueError("GIF: no color table")

    _req_len(content, i + 1, "LZW min code size")
    mcs = content[i]
    i += 1
    data, i = _sub_blocks(content, i)
    idx = np.frombuffer(
        bytes(_lzw_decode(mcs, data, w * h)), dtype=np.uint8
    )
    if int(idx.max()) >= pal.shape[0]:
        raise ValueError("GIF: pixel index beyond color table")

    rows = idx.reshape(h, w)
    if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
        ordered = np.empty_like(rows)
        src = 0
        for start, step in _INTERLACE_PASSES:
            n = len(range(start, h, step))
            ordered[start:h:step] = rows[src : src + n]
            src += n
        rows = ordered

    img = pal[rows]  # (h, w, 3)
    # compose onto the logical screen only when the frame is a strict
    # sub-rectangle — the common single-frame case returns directly
    if (left, top) == (0, 0) and (w, h) == (sw, sh):
        return img.astype(np.uint8)
    if left + w > sw or top + h > sh:
        raise ValueError("GIF: frame outside logical screen")
    screen = np.zeros((sh, sw, 3), dtype=np.uint8)
    if gct is not None:
        bg = content[11]
        if bg < gct.shape[0]:
            screen[:, :] = gct[bg]
    screen[top : top + h, left : left + w] = img
    return screen
