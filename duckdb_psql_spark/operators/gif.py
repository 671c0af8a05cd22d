"""Pure-python GIF87a/89a codec (LZW) — no external imaging libraries.

Round 6 closes another documented pluggable kernel from
operators/multimodal.py: GIF decode now runs for real offline, like PNG
(png.py) and baseline JPEG (jpeg.py). Scope:

* **Decoder**: logical screen descriptor, global/local color tables,
  interlaced and non-interlaced image data, GIF89a extension blocks
  (skipped; transparency index is honored as channels=3 passthrough —
  the first frame's palette lookup), variable-width LSB-first LZW with
  code-size growth and CLEAR/EOI handling. Animated GIFs decode their
  FIRST frame (the standard thumbnail semantic; frame iteration is a
  trivial loop over image descriptors if ever needed).
* **Encoder**: GIF89a writer over an explicit ≤256-color palette and
  per-pixel palette indices, with a real dictionary-building LZW
  compressor (emits CLEAR and resets at 4096 codes) — exists so the
  decoder is offline-testable round-trip, mirroring png.py/jpeg.py.

GIF pixels are palette-indexed, so encode→decode is LOSSLESS (unlike
JPEG): the round-trip test asserts byte identity of the RGB expansion.
"""

from __future__ import annotations

import struct

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def is_gif(data: bytes | None) -> bool:
    return bool(data) and data[:6] in GIF_MAGICS


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, dynamic code width 3..12)
# ---------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes) -> bytearray:
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    # dictionary: code -> byte sequence
    base = [bytes([i]) for i in range(clear)]
    table: list[bytes] = base + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < code_size:
            if pos >= n:
                return out  # truncated stream: return what we have
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = base + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"gif: corrupt LZW stream (code {code})")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            # grow code width when the NEXT code would not fit
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, code_size)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], code_size)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> dict:
    """Decode the first frame to dict(width, height, channels, pixels) —
    RGB byte triples row-major, same contract as png.decode_png."""
    if not is_gif(data):
        raise ValueError("gif: bad signature")
    if len(data) < 13:
        raise ValueError("gif: truncated header")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct: bytes | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = data[pos : pos + 3 * n]
        pos += 3 * n

    def read_subblocks(p: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            if p >= len(data):
                raise ValueError("gif: truncated sub-blocks")
            ln = data[p]
            p += 1
            if ln == 0:
                return b"".join(chunks), p
            chunks.append(data[p : p + ln])
            p += ln

    while pos < len(data):
        intro = data[pos]
        pos += 1
        if intro == 0x21:  # extension: label + sub-blocks, skipped
            pos += 1
            _, pos = read_subblocks(pos)
            continue
        if intro == 0x3B:  # trailer before any image
            break
        if intro != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{intro:02x}")
        _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = data[pos : pos + 3 * n]
            pos += 3 * n
        if ct is None:
            raise ValueError("gif: no color table")
        min_code_size = data[pos]
        pos += 1
        lzw, pos = read_subblocks(pos)
        idx = _lzw_decode(min_code_size, lzw)
        if len(idx) < w * h:
            idx += bytearray(w * h - len(idx))
        if ipacked & 0x40:  # interlaced: remap pass order to row order
            rows = bytearray(w * h)
            src = 0
            for start, step in _INTERLACE_PASSES:
                for y in range(start, h, step):
                    rows[y * w : (y + 1) * w] = idx[src : src + w]
                    src += w
            idx = rows
        px = bytearray(w * h * 3)
        nct = len(ct) // 3
        for i in range(w * h):
            c = idx[i]
            if c >= nct:
                c = 0
            px[3 * i : 3 * i + 3] = ct[3 * c : 3 * c + 3]
        return {
            "width": w,
            "height": h,
            "channels": 3,
            "pixels": bytes(px),
        }
    raise ValueError("gif: no image data")


def encode_gif(
    width: int, height: int, indices: bytes, palette: bytes
) -> bytes:
    """GIF89a writer: ``indices`` = one palette index per pixel
    (row-major), ``palette`` = RGB triples (≤256 entries, padded to a
    power of two)."""
    n_colors = len(palette) // 3
    if not 0 < n_colors <= 256:
        raise ValueError("gif: palette must hold 1..256 RGB entries")
    if len(indices) != width * height:
        raise ValueError("gif: need one index per pixel")
    depth = 1
    while (1 << depth) < n_colors:
        depth += 1
    table = bytearray(palette) + bytes(3 * ((1 << depth) - n_colors))
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    out += table
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    min_code_size = max(2, depth)
    out.append(min_code_size)
    lzw = _lzw_encode(min_code_size, indices)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def synthetic_gif_indices(media_id: int) -> tuple[int, int, bytes, bytes]:
    """Deterministic paletted test image: (w, h, indices, palette).
    Gradients + stripes keyed by media_id, 16-color palette."""
    w = 16 + (media_id % 4) * 8
    h = 12 + (media_id % 3) * 8
    palette = bytearray()
    for i in range(16):
        palette += bytes(
            (
                (i * 17 + media_id * 29) % 256,
                (255 - i * 13 + media_id * 7) % 256,
                (i * 5 * (media_id + 3)) % 256,
            )
        )
    idx = bytearray(
        ((x // 2 + y // 3 + media_id) ^ (x * y % 5)) % 16
        for y in range(h)
        for x in range(w)
    )
    return w, h, bytes(idx), bytes(palette)
