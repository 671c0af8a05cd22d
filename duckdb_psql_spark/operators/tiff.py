"""Pure-python baseline TIFF codec — no external imaging libraries.

Continues the round-6 codec push (gif.py, progressive jpeg.py): TIFF is
the remaining format scanned-document and scientific corpora actually
carry. Everything here is from the public TIFF 6.0 specification.

Decoder scope: 8-bit grayscale and RGB(A), both byte orders (II/MM),
strip-based layout (any RowsPerStrip), Compression 1 (none),
32773 (PackBits), and 5 (TIFF-variant LZW: MSB-first bit packing with
early code-width change, distinct from GIF's LSB-first late-change
LZW), PlanarConfiguration 1 (chunky). Tiled layout, 16-bit samples,
and CCITT/JPEG-in-TIFF raise NotImplementedError with the offending
tag value.

Encoder: II byte order, 8-bit gray or RGB, uncompressed or PackBits,
configurable RowsPerStrip — exists so the decoder is offline-testable
round-trip (both supported compressions are lossless: byte identity).
"""

from __future__ import annotations

import struct


def is_tiff(data: bytes | None) -> bool:
    return bool(data) and data[:4] in (b"II*\x00", b"MM\x00*")


# --- PackBits (TIFF 6.0 section 9) -------------------------------------


def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        n = data[i]
        i += 1
        if n < 128:  # copy n+1 literal bytes
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out[:expect])


def _packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        # find run length at i
        j = i
        while j + 1 < n and row[j + 1] == row[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 2:
            out.append(257 - run)
            out.append(row[i])
            i = j + 1
            continue
        # literal stretch until the next run of >=3 (PackBits guidance)
        lit_start = i
        while i < n:
            j = i
            while j + 1 < n and row[j + 1] == row[i] and j - i < 127:
                j += 1
            if j - i + 1 >= 3 or i - lit_start >= 128:
                break
            i = j + 1
        lit = row[lit_start : min(i, lit_start + 128)]
        i = lit_start + len(lit)
        out.append(len(lit) - 1)
        out += lit
    return bytes(out)


# --- TIFF-variant LZW (TIFF 6.0 section 13): MSB-first, early change ----

_CLEAR, _EOI = 256, 257


def _tiff_lzw_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    base = [bytes([i]) for i in range(256)]
    table = base + [b"", b""]
    code_size = 9
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while len(out) < expect:
        while nbits < code_size:
            if pos >= len(data):
                return bytes(out[:expect])
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - code_size)) & ((1 << code_size) - 1)
        nbits -= code_size
        if code == _CLEAR:
            table = base + [b"", b""]
            code_size = 9
            prev = None
            continue
        if code == _EOI:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"tiff: corrupt LZW stream (code {code})")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        # EARLY change: grow when the NEXT entry would be the last code
        if len(table) == (1 << code_size) - 1 and code_size < 12:
            code_size += 1
    return bytes(out[:expect])


def _tiff_lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc = (acc << size) | code
        nbits += size
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    code_size = 9
    emit(_CLEAR, code_size)
    run = b""
    for b in data:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], code_size)
        table[cand] = next_code
        next_code += 1
        # early change, kept in lockstep with the decoder (which runs one
        # table entry behind the encoder): decoder grows at len == 2^w - 1,
        # so the encoder grows at next_code == 2^w
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4094:
            emit(_CLEAR, code_size)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            code_size = 9
        run = bytes([b])
    if run:
        emit(table[run], code_size)
    emit(_EOI, code_size)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# --- container ----------------------------------------------------------

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_ifd(data: bytes, lt: str) -> dict[int, list[int]]:
    (off,) = struct.unpack_from(lt + "I", data, 4)
    (n,) = struct.unpack_from(lt + "H", data, off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(lt + "HHI", data, base)
        if typ not in _TYPE_SIZES:
            continue
        size = _TYPE_SIZES[typ] * cnt
        if size <= 4:
            voff = base + 8
        else:
            (voff,) = struct.unpack_from(lt + "I", data, base + 8)
        fmt = {1: "B", 2: "B", 3: "H", 4: "I", 5: "II"}[typ]
        vals: list[int] = []
        for k in range(cnt):
            if typ == 5:  # rational → numerator only (unused here)
                num, _den = struct.unpack_from(lt + "II", data, voff + 8 * k)
                vals.append(num)
            else:
                (v,) = struct.unpack_from(
                    lt + fmt, data, voff + _TYPE_SIZES[typ] * k
                )
                vals.append(v)
        tags[tag] = vals
    return tags


def decode_tiff(data: bytes) -> dict:
    """Decode first IFD → dict(width, height, channels, pixels)."""
    if not is_tiff(data):
        raise ValueError("tiff: bad signature")
    lt = "<" if data[:2] == b"II" else ">"
    tags = _read_ifd(data, lt)
    w = tags[256][0]
    h = tags[257][0]
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [8])
    comp = tags.get(259, [1])[0]
    planar = tags.get(284, [1])[0]
    if any(b != 8 for b in bps):
        raise NotImplementedError(f"tiff: only 8-bit samples (got {bps})")
    if planar != 1:
        raise NotImplementedError("tiff: only chunky PlanarConfiguration=1")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(f"tiff: unsupported Compression={comp}")
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiff: tiled layout not supported")
    offsets = tags[273]
    counts = tags[279]
    rps = tags.get(278, [h])[0] or h
    row_bytes = w * spp
    out = bytearray()
    for si, (o, c) in enumerate(zip(offsets, counts)):
        nrows = min(rps, h - si * rps)
        expect = nrows * row_bytes
        chunk = data[o : o + c]
        if comp == 1:
            out += chunk[:expect]
        elif comp == 32773:
            out += _packbits_decode(chunk, expect)
        else:
            out += _tiff_lzw_decode(chunk, expect)
    if len(out) < h * row_bytes:
        out += bytes(h * row_bytes - len(out))
    return {
        "width": w,
        "height": h,
        "channels": spp,
        "pixels": bytes(out[: h * row_bytes]),
    }


def encode_tiff(
    width: int,
    height: int,
    pixels: bytes,
    *,
    channels: int = 3,
    compression: int = 1,
    rows_per_strip: int = 8,
) -> bytes:
    """Write an II-order baseline TIFF (8-bit gray or RGB; Compression
    1 = none, 32773 = PackBits, 5 = LZW)."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if compression not in (1, 5, 32773):
        raise ValueError("compression must be 1, 5, or 32773")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    row_bytes = width * channels
    strips: list[bytes] = []
    for y0 in range(0, height, rows_per_strip):
        raw = pixels[y0 * row_bytes : min(y0 + rows_per_strip, height) * row_bytes]
        if compression == 1:
            strips.append(raw)
        elif compression == 32773:
            strips.append(_packbits_encode(raw))
        else:
            strips.append(_tiff_lzw_encode(raw))

    # layout: header(8) + strip data + IFD
    header = struct.pack("<2sHI", b"II", 42, 0)  # IFD offset patched below
    data_off = 8
    strip_offsets = []
    pos = data_off
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    ifd_off = pos

    def entry(tag: int, typ: int, vals: list[int]) -> tuple[bytes, bytes]:
        size = _TYPE_SIZES[typ] * len(vals)
        fmt = {3: "H", 4: "I"}[typ]
        packed = b"".join(struct.pack("<" + fmt, v) for v in vals)
        if size <= 4:
            return (
                struct.pack("<HHI", tag, typ, len(vals)) + packed.ljust(4, b"\0"),
                b"",
            )
        return (struct.pack("<HHI", tag, typ, len(vals)), packed)

    tags: list[tuple[int, int, list[int]]] = [
        (256, 4, [width]),
        (257, 4, [height]),
        (258, 3, [8] * channels),
        (259, 3, [compression]),
        (262, 3, [1 if channels == 1 else 2]),  # photometric
        (273, 4, strip_offsets),
        (277, 3, [channels]),
        (278, 4, [rows_per_strip]),
        (279, 4, [len(s) for s in strips]),
        (284, 3, [1]),
    ]
    n = len(tags)
    # out-of-line values land after the IFD
    tail_off = ifd_off + 2 + 12 * n + 4
    entries = b""
    tail = b""
    for tag, typ, vals in tags:
        head, overflow = entry(tag, typ, vals)
        if overflow:
            head = head + struct.pack("<I", tail_off + len(tail))
            tail += overflow
        entries += head
    ifd = struct.pack("<H", n) + entries + struct.pack("<I", 0)
    out = bytearray(header)
    out[4:8] = struct.pack("<I", ifd_off)
    for s in strips:
        out += s
    out += ifd + tail
    return bytes(out)


def synthetic_tiff_pixels(media_id: int) -> tuple[int, int, int, bytes]:
    """Deterministic test image: (w, h, channels, pixels) with runs and
    gradients so PackBits/LZW both get compressible structure."""
    w = 20 + (media_id % 4) * 12
    h = 14 + (media_id % 3) * 10
    ch = 1 if media_id % 3 == 0 else 3
    px = bytearray()
    for y in range(h):
        for x in range(w):
            if ch == 1:
                px.append((x // 4 * 16 + y + media_id) % 256)
            else:
                px += bytes(
                    (
                        (x // 3 * 8 + media_id) % 256,
                        (y * 5) % 256,
                        ((x + y) // 2) % 256,
                    )
                )
    return w, h, ch, bytes(px)
