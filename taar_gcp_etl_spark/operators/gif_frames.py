"""Frame iteration over animated GIFs — the video-style modality
without ffmpeg (NEXT.md r7 #3).

`iter_gif_frames` walks every image descriptor in the stream and
decodes each frame's pixel CONTENT independently onto the logical
screen (sub-rect frames composed onto the background color). Scope is
deliberate and documented: this is per-frame content, NOT composited
playback — GCE disposal methods and transparency blending are ignored,
because the consumers here are perceptual fingerprints (frame-sampled
dHash feeding the shared banded-Hamming near-dup engine), which
compare what a frame DRAWS, not what a viewer composites. Corrupt
frames raise ValueError into the standard DECODE_ERRORS drop path.

`gif_frame_hashes` is the fingerprint face: up to ``max_frames``
evenly-sampled frames → 64-bit dHash words, the same (hi, lo) shape as
text SimHash and still-image dHash, so animated near-dup rides the
existing pairing machinery (two animations match when sampled frames
collide in a band).
"""

from __future__ import annotations

import struct

import numpy as np

from taar_gcp_etl_spark.operators.gif import (
    _INTERLACE_PASSES,
    _color_table,
    _lzw_decode,
    _req_len,
    _sub_blocks,
)


def iter_gif_frames(content: bytes, max_frames: int = 64):
    """Yield (h, w, 3) uint8 RGB arrays, one per image descriptor (in
    stream order, at most ``max_frames``)."""
    _req_len(content, 13, "header")
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (missing signature)")
    sw, sh = struct.unpack("<HH", content[6:10])
    packed = content[10]
    i = 13
    gct, i = _color_table(content, i, packed)
    bg = content[11]
    yielded = 0

    while yielded < max_frames:
        _req_len(content, i + 1, "block")
        b = content[i]
        i += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            _req_len(content, i + 1, "extension label")
            i += 1
            _, i = _sub_blocks(content, i)
            continue
        if b != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{b:02x}")

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
        if ipacked & 0x40:
            ordered = np.empty_like(rows)
            src = 0
            for start, step in _INTERLACE_PASSES:
                n = len(range(start, h, step))
                ordered[start:h:step] = rows[src : src + n]
                src += n
            rows = ordered
        img = pal[rows]
        if (left, top) == (0, 0) and (w, h) == (sw, sh):
            yield img.astype(np.uint8)
        else:
            if left + w > sw or top + h > sh:
                raise ValueError("GIF: frame outside logical screen")
            screen = np.zeros((sh, sw, 3), dtype=np.uint8)
            if gct is not None and bg < gct.shape[0]:
                screen[:, :] = gct[bg]
            screen[top : top + h, left : left + w] = img
            yield screen
        yielded += 1
    if yielded == 0:
        raise ValueError("GIF: no image data")


def gif_frame_hashes(
    content: bytes, max_frames: int = 8
) -> list[tuple[int, int, int]]:
    """(frame_index, hash_hi, hash_lo) for up to ``max_frames`` frames,
    sampled evenly across the animation (all frames when it is short).
    Decoding stops at the last sampled frame — a 1000-frame animation
    sampled at 8 still decodes serially up to its last sample, which is
    the honest cost of LZW's stream dependency."""
    from taar_gcp_etl_spark.operators.multimodal import dhash64

    frames = list(iter_gif_frames(content, max_frames=10_000))
    n = len(frames)
    if n <= max_frames:
        picks = range(n)
    else:
        picks = sorted({(k * (n - 1)) // (max_frames - 1)
                        for k in range(max_frames)})
    out = []
    for k in picks:
        hi, lo = dhash64(frames[k])
        out.append((k, hi, lo))
    return out
