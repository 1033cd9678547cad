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


def _walk_frames(content: bytes):
    """Structural pass: yield one dict per image descriptor WITHOUT
    LZW-decoding — sub-block concatenation only, so counting/seeking
    frames is cheap relative to entropy decode (each frame's LZW
    stream is self-contained: it starts clear-initialized)."""
    _req_len(content, 13, "header")
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (missing signature)")
    sw, sh = struct.unpack("<HH", content[6:10])
    packed = content[10]
    i = 13
    gct, i = _color_table(content, i, packed)
    bg = content[11]
    seen = False

    while True:
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
        seen = True
        yield {
            "left": left, "top": top, "w": w, "h": h,
            "ipacked": ipacked, "pal": pal, "mcs": mcs, "data": data,
            "sw": sw, "sh": sh, "gct": gct, "bg": bg,
        }
    if not seen:
        raise ValueError("GIF: no image data")


def _decode_frame(f: dict) -> np.ndarray:
    """LZW-decode one _walk_frames entry to (h, w, 3) RGB."""
    w, h, pal = f["w"], f["h"], f["pal"]
    idx = np.frombuffer(
        bytes(_lzw_decode(f["mcs"], f["data"], w * h)), dtype=np.uint8
    )
    if int(idx.max()) >= pal.shape[0]:
        raise ValueError("GIF: pixel index beyond color table")
    rows = idx.reshape(h, w)
    if f["ipacked"] & 0x40:
        ordered = np.empty_like(rows)
        src = 0
        for start, step in _INTERLACE_PASSES:
            n = len(range(start, h, step))
            ordered[start:h:step] = rows[src : src + n]
            src += n
        rows = ordered
    img = pal[rows]
    left, top, sw, sh = f["left"], f["top"], f["sw"], f["sh"]
    if (left, top) == (0, 0) and (w, h) == (sw, sh):
        return img.astype(np.uint8)
    if left + w > sw or top + h > sh:
        raise ValueError("GIF: frame outside logical screen")
    screen = np.zeros((sh, sw, 3), dtype=np.uint8)
    gct, bg = f["gct"], f["bg"]
    if gct is not None and bg < gct.shape[0]:
        screen[:, :] = gct[bg]
    screen[top : top + h, left : left + w] = img
    return screen


def iter_gif_frames(content: bytes, max_frames: int = 64):
    """Yield (h, w, 3) uint8 RGB arrays, one per image descriptor (in
    stream order, at most ``max_frames``)."""
    for k, f in enumerate(_walk_frames(content)):
        if k >= max_frames:
            break
        yield _decode_frame(f)


def gif_frame_hashes(
    content: bytes, max_frames: int = 8
) -> list[tuple[int, int, int]]:
    """(frame_index, hash_hi, hash_lo) for up to ``max_frames`` frames,
    sampled evenly across the animation (all frames when it is short).
    Frame LZW streams are self-contained (each starts from a clear-
    initialized dictionary), so the frame census is a cheap structural
    walk and only the SAMPLED frames pay entropy decode — a
    1000-frame animation sampled at 8 runs 8 LZW decodes, not 1000."""
    from taar_gcp_etl_spark.operators.multimodal import dhash64

    raw = list(_walk_frames(content))
    out = []
    for k in even_sample_picks(len(raw), max_frames):
        hi, lo = dhash64(_decode_frame(raw[k]))
        out.append((k, hi, lo))
    return out


def even_sample_picks(n: int, max_frames: int):
    """Evenly-spaced sample indices over ``n`` frames — the one shared
    implementation for every frame-sampling modality (GIF animations,
    MJPEG movies), so a sampling fix lands once (the max_frames=1
    divide-by-zero needed fixing twice before this existed).

    max_frames < 1 is a CONFIG defect, not a corrupt blob, and raises
    TypeError — deliberately NOT a DECODE_ERRORS member (ValueError
    is), so an executor-side containment `except DECODE_ERRORS` cannot
    silently drop the whole corpus over a bad argument."""
    if max_frames < 1:
        raise TypeError(f"max_frames must be >= 1, got {max_frames}")
    if n <= max_frames:
        return range(n)
    if max_frames == 1:
        return [0]
    return sorted({(k * (n - 1)) // (max_frames - 1)
                   for k in range(max_frames)})
