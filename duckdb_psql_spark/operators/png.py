"""Minimal pure-Python PNG codec (stdlib only: zlib + struct).

The container has no image libraries, but PNG is fully decodable with
zlib: chunk framing, IDAT inflate, and the five scanline filters are all
in the public spec (RFC 2083 / W3C PNG). This gives the multimodal
operators one REAL decode path — 8-bit greyscale/RGB/RGBA — while other
formats stay stubbed.

Encoder output is deliberately simple (filter 0, one IDAT); the decoder
handles any filter so real-world baseline PNGs decode too. No interlace
support (Adam7 raises).
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # grey, rgb, grey+a, rgba


def is_png(data: bytes | None) -> bool:
    return bool(data) and bytes(data[:8]) == _SIG


def _chunk(kind: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + kind
        + body
        + struct.pack(">I", zlib.crc32(kind + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, *, color_type: int = 2) -> bytes:
    """Encode raw 8-bit pixels (row-major, no padding) as a baseline PNG."""
    ch = _CHANNELS[color_type]
    if len(pixels) != width * height * ch:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected {width * height * ch}"
        )
    stride = width * ch
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> dict:
    """Decode a baseline PNG → dict(width, height, bit_depth, color_type,
    channels, pixels) with ``pixels`` as raw row-major bytes (filters
    undone). Supports 8-bit depth, color types 0/2/4/6, no interlace."""
    data = bytes(data)
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = bit_depth = color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        kind = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + kind + body + crc
        if kind == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth != 8:
                raise NotImplementedError(f"bit depth {bit_depth} (only 8 supported)")
            if color_type not in _CHANNELS:
                raise NotImplementedError(f"color type {color_type}")
            if interlace:
                raise NotImplementedError("Adam7 interlace")
        elif kind == b"IDAT":
            idat.extend(body)
        elif kind == b"IEND":
            break
    if width is None:
        raise ValueError("no IHDR chunk")
    raw = zlib.decompress(bytes(idat))
    ch = _CHANNELS[color_type]
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")
    out = bytearray(height * stride)
    prev = bytearray(stride)
    for y in range(height):
        row_start = y * (stride + 1)
        f = raw[row_start]
        line = bytearray(raw[row_start + 1 : row_start + 1 + stride])
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown filter {f}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return {
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
        "channels": ch,
        "pixels": bytes(out),
    }


def synthetic_pixels(media_id: int) -> tuple[int, int, bytes]:
    """Deterministic small RGB pixel buffer: (width, height, raw bytes).

    Exposed separately from the encoder so oracles can assert against the
    PRE-encode pixels — a decode that merely parrots the header can't pass."""
    width = 8 + media_id % 9
    height = 6 + media_id % 7
    px = bytearray()
    for y in range(height):
        for x in range(width):
            px += bytes(
                (
                    (x * 31 + media_id) % 256,
                    (y * 53 + media_id * 7) % 256,
                    (x * y + media_id * 13) % 256,
                )
            )
    return width, height, bytes(px)


def synthetic_png(media_id: int) -> tuple[int, int, bytes]:
    """Deterministic small RGB test image: (width, height, png_bytes)."""
    width, height, px = synthetic_pixels(media_id)
    return width, height, encode_png(width, height, px)
