"""Pure-stdlib RIFF/AVI codec (uncompressed 8-bit grayscale DIB frames).

The video sibling of ``png_codec.py`` (image) and the stdlib ``wave`` tier
(audio): a REAL container format written and parsed in this container, so the
multimodal video path exercises genuine demux work — chunk walking, header
validation, frame extraction — not a fake byte split.  AVI is RIFF (the same
container family as WAV), which keeps the writer/parser honest yet
stdlib-only:

    RIFF('AVI '
        LIST('hdrl'
            'avih' (main header: µs/frame, total frames, W, H)
            LIST('strl'
                'strh' ('vids'/'DIB ', scale/rate = fps, length)
                'strf' (BITMAPINFOHEADER, 8-bit, + 256-entry gray palette)))
        LIST('movi'
            '00db' raw frame bytes, one chunk per frame, top-down rows))

The parser is a generic RIFF chunk walker: it validates the RIFF/'AVI '
magic, recurses into LISTs, reads geometry from ``avih``/``strf`` (bit count
must be 8, compression 0), and returns frames from the ``00db`` chunks in
stream order, checking each chunk's size against W×H.  Malformed input
raises ``ValueError`` — a demuxer that guesses is a silent-corruption
factory at corpus scale.

No reference counterpart (the reference engine has no media handling);
LLM-pipeline multimodal extension tier.
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def avi_write(frames: list[bytes], width: int, height: int, fps: int) -> bytes:
    """Serialize raw top-down 8-bit grayscale frames as a RIFF/AVI byte
    string.  Every frame must be exactly ``width * height`` bytes."""
    fsize = width * height
    for f in frames:
        if len(f) != fsize:
            raise ValueError(f"frame size {len(f)} != {fsize}")
    n = len(frames)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        fsize * fps,       # max bytes per second
        0,                 # padding granularity
        0,                 # flags: no idx1 is written, so AVIF_HASINDEX must be off
        n,                 # total frames
        0, 1, fsize,       # initial frames, streams, suggested buffer
        width, height,
        0, 0, 0, 0)        # reserved
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ",
        0, 0, 0, 0,
        1, fps,            # scale, rate -> rate/scale = fps
        0, n, fsize, 0xFFFFFFFF, 0,
        0, 0, width, height)
    # BITMAPINFOHEADER + 256-entry grayscale palette (required at 8 bpp)
    bmih = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 8, 0,
                       fsize, 0, 0, 256, 0)
    palette = b"".join(bytes((v, v, v, 0)) for v in range(256))
    hdrl = _list(b"hdrl",
                 _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", bmih + palette)))
    movi = _list(b"movi", b"".join(_chunk(b"00db", f) for f in frames))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)


def _walk(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for chunks in buf[start:end],
    descending into LISTs (the LIST's own 4-byte type is consumed first)."""
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError("chunk overruns container")
        if fourcc in (b"LIST", b"RIFF"):
            yield buf[body:body + 4], body + 4, size - 4
            yield from _walk(buf, body + 4, body + size)
        else:
            yield fourcc, body, size
        pos = body + size + (size % 2)


def avi_parse(buf: bytes) -> tuple[int, int, int, list[bytes]]:
    """Parse an AVI byte string -> (width, height, fps, frames).

    Validates the RIFF/'AVI ' magic, the 8-bit uncompressed DIB format, and
    every frame chunk's size against the header geometry.  The stream layout
    is validated too: exactly one ``'vids'`` ``strh`` and exactly one
    ``strf`` must appear — a second stream (whose scale/rate would silently
    clobber fps) or a missing ``strf`` (whose absence would skip the DIB
    format check entirely) raises, mirroring the missing-avih/strh check."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    width = height = fps = None
    n_declared = None
    n_strf = 0
    frames: list[bytes] = []
    for fourcc, off, size in _walk(buf, 12, len(buf)):
        if fourcc == b"avih":
            if size < 40:
                raise ValueError("short avih")
            vals = struct.unpack_from("<IIIIIIIIII", buf, off)
            n_declared, width, height = vals[4], vals[8], vals[9]
        elif fourcc == b"strh":
            if size < 28:
                raise ValueError("short strh")
            if buf[off:off + 4] != b"vids":
                raise ValueError("unsupported stream type (single-'vids' "
                                 "container contract)")
            if fps is not None:
                raise ValueError("multiple 'vids' streams")
            scale, rate = struct.unpack_from("<II", buf, off + 20)
            if scale == 0 or rate % scale:
                raise ValueError("non-integer frame rate")
            fps = rate // scale
        elif fourcc == b"strf":
            if size < 20:
                raise ValueError("short strf")
            n_strf += 1
            bits, comp = struct.unpack_from("<HI", buf, off + 14)
            if bits != 8 or comp != 0:
                raise ValueError("not 8-bit uncompressed DIB")
        elif fourcc == b"00db":
            if width is None or size != width * height:
                raise ValueError("frame chunk size mismatch")
            frames.append(buf[off:off + size])
    if width is None or fps is None:
        raise ValueError("missing avih/strh headers")
    if n_strf != 1:
        raise ValueError(f"expected exactly one strf, found {n_strf}")
    if n_declared != len(frames):
        raise ValueError(f"header declares {n_declared} frames, "
                         f"found {len(frames)}")
    return width, height, fps, frames
