"""Pure-python WebP-lossless (VP8L) codec — no external imaging libraries.

Completes the round-6 codec push (gif.py, tiff.py, progressive
jpeg.py): after this, every format named in the charter's multimodal
notes decodes offline. Everything here follows the public "WebP
Lossless Bitstream Specification".

Decoder scope: the VP8L lossless stream inside a RIFF/WEBP container —
LSB-first bit reading, simple AND full (code-length-coded) canonical
prefix codes, the five-code entropy group (G/R/B/A/distance), LZ77
backward references with the 120-entry 2D distance map, color cache,
meta-prefix tiling, and all four inverse transforms (predictor / color /
subtract-green / color-indexing incl. sub-byte pixel packing). Lossy
VP8 raises NotImplementedError.

Encoder: RIFF + VP8L writer with no transforms, no color cache, and one
prefix-code group (simple 2-symbol codes where a channel has ≤2 values,
full code-length coding otherwise; literals only — correctness over
ratio), used to round-trip-test the decoder offline. Lossless means the
round-trip is asserted byte-exact on RGBA.

Prefix-code bit order follows the spec's DEFLATE convention: canonical
codes are transmitted starting from the most-significant code bit,
while every other field is LSB-first.
"""

from __future__ import annotations

import struct


def is_webp(data: bytes | None) -> bool:
    return (
        bool(data)
        and len(data) >= 12
        and data[:4] == b"RIFF"
        and data[8:12] == b"WEBP"
    )


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bits(self, k: int) -> int:
        while self.n < k:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc |= b << self.n
            self.n += 8
        v = self.acc & ((1 << k) - 1)
        self.acc >>= k
        self.n -= k
        return v

    def bit(self) -> int:
        return self.bits(1)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v: int, k: int) -> None:
        self.acc |= (v & ((1 << k) - 1)) << self.n
        self.n += k
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


# --- canonical prefix codes (DEFLATE convention) ------------------------


class _PrefixDecoder:
    def __init__(self, lengths: list[int]):
        self.single: int | None = None
        nz = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
        if len(nz) == 1:
            self.single = nz[0][1]
            return
        # canonical assignment: by (length, symbol)
        self.map: dict[tuple[int, int], int] = {}
        code = 0
        last_len = 0
        for ln, sym in sorted(nz):
            code <<= ln - last_len
            last_len = ln
            self.map[(ln, code)] = sym
            code += 1

    def read(self, r: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        ln = 0
        for _ in range(15):
            code = (code << 1) | r.bit()
            ln += 1
            sym = self.map.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("webp: invalid prefix code")


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    nz = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    last_len = 0
    for ln, sym in sorted(nz):
        code <<= ln - last_len
        last_len = ln
        codes[sym] = (code, ln)
        code += 1
    return codes


def _build_lengths(freqs: dict[int, int], max_len: int = 15) -> list[int]:
    """Length-limited Huffman code lengths over a dense symbol space."""
    import heapq

    n = (max(freqs) + 1) if freqs else 1
    items = [(f, s) for s, f in freqs.items() if f > 0]
    lengths = [0] * n
    if not items:
        return lengths
    if len(items) == 1:
        lengths[items[0][1]] = 1
        return lengths
    heap = [(f, s, (s,)) for f, s in items]
    heapq.heapify(heap)
    while len(heap) > 1:
        f1, t1, syms1 = heapq.heappop(heap)
        f2, t2, syms2 = heapq.heappop(heap)
        for s in syms1 + syms2:
            lengths[s] += 1
        heapq.heappush(heap, (f1 + f2, min(t1, t2), syms1 + syms2))
    # limit depth (rarely needed at our sizes): flatten overlong codes
    while max(lengths) > max_len:
        over = lengths.index(max(lengths))
        donor = min(
            (s for s in range(n) if 0 < lengths[s] < max_len - 1),
            key=lambda s: lengths[s],
            default=None,
        )
        if donor is None:
            raise ValueError("webp: cannot limit code lengths")
        lengths[over] = max_len
        lengths[donor] += 1
    # Kraft fix-up: recompute canonically if inequality broken
    kraft = sum(1 << (max_len - l) for l in lengths if l)
    if kraft > (1 << max_len):
        # fallback: balanced code over present symbols
        present = [s for s in range(n) if lengths[s]]
        depth = 1
        while (1 << depth) < len(present):
            depth += 1
        for s in present:
            lengths[s] = depth
    return lengths


# --- code-length-code (spec section on normal prefix codes) -------------

_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_prefix_code(r: _BitReader, alphabet_size: int) -> _PrefixDecoder:
    if r.bit():  # simple code
        num_symbols = r.bit() + 1
        if r.bit():  # first symbol is 8 bits
            first = r.bits(8)
        else:
            first = r.bit()
        dec = _PrefixDecoder([])
        if num_symbols == 1:
            dec.single = first
        else:
            # bits assign by TRANSMISSION order (spec): first → 0,
            # second → 1 — NOT canonical-by-symbol-value
            second = r.bits(8)
            dec.map = {(1, 0): first, (1, 1): second}
        return dec
    # full: code lengths coded with the code-length code
    num_clc = 4 + r.bits(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = r.bits(3)
    clc = _PrefixDecoder(clc_lengths)
    if r.bit():  # use max_symbol
        length_nbits = 2 + 2 * r.bits(3)
        max_symbol = 2 + r.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        sym = clc.read(r)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev = sym
        elif sym == 16:
            for _ in range(3 + r.bits(2)):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif sym == 17:
            i += 3 + r.bits(3)
        else:  # 18
            i += 11 + r.bits(7)
    return _PrefixDecoder(lengths)


def _write_prefix_code(w: _BitWriter, lengths: list[int]) -> None:
    nz = [s for s, ln in enumerate(lengths) if ln]
    if 1 <= len(nz) <= 2 and all(lengths[s] == 1 for s in nz) and max(nz) < 256:
        # simple code
        w.bits(1, 1)
        w.bits(len(nz) - 1, 1)
        first = nz[0]
        if first > 1:
            w.bits(1, 1)
            w.bits(first, 8)
        else:
            w.bits(0, 1)
            w.bits(first, 1)
        if len(nz) == 2:
            w.bits(nz[1], 8)
        return
    w.bits(0, 1)
    # literal-only code-length coding: each length as its own CLC symbol
    clc_freq: dict[int, int] = {}
    for ln in lengths:
        clc_freq[ln] = clc_freq.get(ln, 0) + 1
    clc_lengths = _build_lengths(clc_freq, max_len=7)
    clc_lengths += [0] * (19 - len(clc_lengths))
    # emit all 19 CLC lengths (num_clc = 19 → bits(15, 4))
    w.bits(15, 4)
    for sym in _CLC_ORDER:
        w.bits(clc_lengths[sym], 3)
    w.bits(0, 1)  # no max_symbol shortcut
    codes = _canonical_codes(clc_lengths)
    for ln in lengths:
        c, k = codes[ln]
        # MSB-first transmission of the canonical code
        for b in range(k - 1, -1, -1):
            w.bits((c >> b) & 1, 1)


# --- LZ77 prefix value coding -------------------------------------------


def _lz77_value(r: _BitReader, code: int) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + r.bits(extra) + 1


# The spec's 120-entry 2D distance map (dx, dy), in code order — short
# distance codes address spatially-near pixels.
_DIST_TABLE = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def _plane_dist(code: int, width: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_TABLE[code - 1]
    d = dy * width + dx
    return max(d, 1)


# --- entropy-coded image (the recursive core) ---------------------------


def _read_entropy_image(
    r: _BitReader, width: int, height: int, *, is_main: bool
) -> list[int]:
    """Decode a spatially-coded ARGB image → list of packed ARGB ints."""
    cache_bits = 0
    if r.bit():
        cache_bits = r.bits(4)
    cache_size = (1 << cache_bits) if cache_bits else 0
    meta = None
    prefix_bits = 0
    n_groups = 1
    if is_main and r.bit():
        prefix_bits = 2 + r.bits(3)
        mw = (width + (1 << prefix_bits) - 1) >> prefix_bits
        mh = (height + (1 << prefix_bits) - 1) >> prefix_bits
        meta = _read_entropy_image(r, mw, mh, is_main=False)
        n_groups = max(((p >> 8) & 0xFFFF) for p in meta) + 1
    groups = []
    for _ in range(n_groups):
        g = _read_prefix_code(r, 256 + 24 + cache_size)
        rr = _read_prefix_code(r, 256)
        b = _read_prefix_code(r, 256)
        a = _read_prefix_code(r, 256)
        d = _read_prefix_code(r, 40)
        groups.append((g, rr, b, a, d))
    cache = [0] * cache_size
    px: list[int] = []
    n = width * height
    while len(px) < n:
        if meta is not None:
            x = len(px) % width
            y = len(px) // width
            mp = meta[(y >> prefix_bits) * ((width + (1 << prefix_bits) - 1) >> prefix_bits) + (x >> prefix_bits)]
            gidx = (mp >> 8) & 0xFFFF
        else:
            gidx = 0
        gc, rc, bc, ac, dc = groups[gidx]
        s = gc.read(r)
        if s < 256:
            red = rc.read(r)
            blue = bc.read(r)
            alpha = ac.read(r)
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            px.append(argb)
            if cache_size:
                cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
        elif s < 256 + 24:
            length = _lz77_value(r, s - 256)
            dcode = _lz77_value(r, dc.read(r))
            dist = _plane_dist(dcode, width)
            for _ in range(length):
                argb = px[-dist]
                px.append(argb)
                if cache_size:
                    cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
        else:
            px.append(cache[s - 256 - 24])
    return px


# --- inverse transforms -------------------------------------------------


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) >> 1) << 24)
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16)
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8)
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _add_px(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) & 0xFF) << 24)
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16)
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8)
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


def _clamp_grad(a: int, b: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF)
        v = 0 if v < 0 else (255 if v > 255 else v)
        out |= v << sh
    return out


def _apply_predictor_inverse(
    px: list[int], width: int, height: int, modes: list[int], bits: int
) -> None:
    tile_w = (width + (1 << bits) - 1) >> bits
    for i in range(width * height):
        x, y = i % width, i // width
        if x == 0 and y == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = px[i - 1]
        elif x == 0:
            pred = px[i - width]
        else:
            mode = (modes[(y >> bits) * tile_w + (x >> bits)] >> 8) & 0xFF
            L = px[i - 1]
            T = px[i - width]
            TL = px[i - width - 1]
            TR = px[i - width + 1] if x + 1 < width else px[i - width]
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = L
            elif mode == 2:
                pred = T
            elif mode == 3:
                pred = TR
            elif mode == 4:
                pred = TL
            elif mode == 5:
                pred = _avg2(_avg2(L, TR), T)
            elif mode == 6:
                pred = _avg2(L, TL)
            elif mode == 7:
                pred = _avg2(L, T)
            elif mode == 8:
                pred = _avg2(TL, T)
            elif mode == 9:
                pred = _avg2(T, TR)
            elif mode == 10:
                pred = _avg2(_avg2(L, TL), _avg2(T, TR))
            elif mode == 11:  # select
                pl = sum(
                    abs(((T >> sh) & 0xFF) - ((TL >> sh) & 0xFF))
                    for sh in (24, 16, 8, 0)
                )
                pt = sum(
                    abs(((L >> sh) & 0xFF) - ((TL >> sh) & 0xFF))
                    for sh in (24, 16, 8, 0)
                )
                pred = L if pl < pt else T
            elif mode == 12:
                pred = _clamp_grad(L, T, TL)
            else:
                # 13: ClampAddSubtractHalf
                half = _avg2(L, T)
                out = 0
                for sh in (24, 16, 8, 0):
                    h = (half >> sh) & 0xFF
                    tl = (TL >> sh) & 0xFF
                    v = h + (h - tl) // 2
                    v = 0 if v < 0 else (255 if v > 255 else v)
                    out |= v << sh
                pred = out
        px[i] = _add_px(px[i], pred)


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _delta(t: int, c: int) -> int:
    return (_s8(t) * _s8(c)) >> 5


def _apply_color_inverse(
    px: list[int], width: int, height: int, tiles: list[int], bits: int
) -> None:
    tile_w = (width + (1 << bits) - 1) >> bits
    for i in range(width * height):
        x, y = i % width, i // width
        t = tiles[(y >> bits) * tile_w + (x >> bits)]
        g2r = (t >> 8) & 0xFF
        g2b = (t >> 16) & 0xFF
        r2b = (t >> 24) & 0xFF
        argb = px[i]
        a = (argb >> 24) & 0xFF
        r = (argb >> 16) & 0xFF
        g = (argb >> 8) & 0xFF
        b = argb & 0xFF
        r = (r + _delta(g2r, g)) & 0xFF
        b = (b + _delta(g2b, g) + _delta(r2b, r)) & 0xFF
        px[i] = (a << 24) | (r << 16) | (g << 8) | b


def _apply_subtract_green_inverse(px: list[int]) -> None:
    for i, argb in enumerate(px):
        g = (argb >> 8) & 0xFF
        r = (((argb >> 16) & 0xFF) + g) & 0xFF
        b = ((argb & 0xFF) + g) & 0xFF
        px[i] = (argb & 0xFF00FF00) | (r << 16) | b


def _libwebp():
    """The system libwebp, when the deployment image ships one — the
    documented lossy-VP8 kernel swap (round 11). Returns the configured
    ctypes handle or None; cached after the first probe."""
    global _LIBWEBP
    if _LIBWEBP is not _UNPROBED:
        return _LIBWEBP
    try:
        import ctypes

        lib = ctypes.CDLL("libwebp.so.7")
        lib.WebPDecodeRGBA.restype = ctypes.c_void_p
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        _LIBWEBP = lib
    except (OSError, AttributeError):
        _LIBWEBP = None
    return _LIBWEBP


_UNPROBED = object()
_LIBWEBP = _UNPROBED


def _decode_lossy_system(data: bytes) -> dict:
    """Lossy (VP8) / extended (VP8X) WebP through the system libwebp.

    VP8 intra-frame reconstruction needs ~3000 empirical probability
    constants from RFC 6386 that cannot be derived, so a faithful
    from-scratch decoder is not writable offline; the in-container
    libwebp.so.7 IS the kernel the per-row error contract named as the
    deployment swap. When the library is absent the documented
    NotImplementedError contract stands."""
    import ctypes

    lib = _libwebp()
    if lib is None:
        raise NotImplementedError(
            "only lossless (VP8L) WebP is supported offline"
        )
    w = ctypes.c_int()
    h = ctypes.c_int()
    buf = lib.WebPDecodeRGBA(
        data, len(data), ctypes.byref(w), ctypes.byref(h)
    )
    if not buf:
        raise ValueError("webp: lossy decode failed (corrupt stream)")
    try:
        n = w.value * h.value * 4
        pixels = bytes(
            ctypes.cast(buf, ctypes.POINTER(ctypes.c_ubyte * n)).contents
        )
    finally:
        lib.WebPFree(buf)
    return {
        "width": w.value,
        "height": h.value,
        "channels": 4,
        "pixels": pixels,
    }


def decode_webp(data: bytes) -> dict:
    """Decode a WebP → dict(width, height, channels=4, pixels RGBA
    row-major). Lossless (VP8L) decodes through the from-scratch
    decoder below; lossy (VP8) / extended (VP8X) route through the
    system libwebp when present (see _decode_lossy_system)."""
    if not is_webp(data):
        raise ValueError("webp: bad RIFF signature")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            payload = body
            break
        if tag in (b"VP8 ", b"VP8X"):
            return _decode_lossy_system(data)
        pos += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("webp: no VP8L chunk")
    if payload[0] != 0x2F:
        raise ValueError("webp: bad VP8L signature byte")
    r = _BitReader(payload[1:])
    width = r.bits(14) + 1
    height = r.bits(14) + 1
    r.bit()  # alpha hint
    if r.bits(3) != 0:
        raise ValueError("webp: unsupported VP8L version")

    # transforms (applied inverse in reverse order)
    transforms: list[tuple] = []
    xsize = width
    while r.bit():
        ttype = r.bits(2)
        if ttype == 2:  # subtract green
            transforms.append((2,))
        elif ttype == 3:  # color indexing
            n_colors = r.bits(8) + 1
            palette = _read_entropy_image(r, n_colors, 1, is_main=False)
            # delta-coded palette
            for i in range(1, n_colors):
                palette[i] = _add_px(palette[i], palette[i - 1])
            if n_colors <= 2:
                pack_bits = 3  # 8 pixels per byte
            elif n_colors <= 4:
                pack_bits = 2
            elif n_colors <= 16:
                pack_bits = 1
            else:
                pack_bits = 0
            transforms.append((3, palette, pack_bits, xsize))
            if pack_bits:
                xsize = (xsize + (1 << pack_bits) - 1) >> pack_bits
        else:  # 0 predictor / 1 color: tile sub-image
            bits = 2 + r.bits(3)
            tw = (xsize + (1 << bits) - 1) >> bits
            th = (height + (1 << bits) - 1) >> bits
            tiles = _read_entropy_image(r, tw, th, is_main=False)
            transforms.append((ttype, tiles, bits))

    px = _read_entropy_image(r, xsize, height, is_main=True)

    for tf in reversed(transforms):
        if tf[0] == 2:
            _apply_subtract_green_inverse(px)
        elif tf[0] == 0:
            _apply_predictor_inverse(px, xsize, height, tf[1], tf[2])
        elif tf[0] == 1:
            _apply_color_inverse(px, xsize, height, tf[1], tf[2])
        else:
            _, palette, pack_bits, orig_w = tf
            if pack_bits:
                # unpack sub-byte indices from the green channel
                per = 1 << pack_bits
                ibits = 8 >> pack_bits
                out: list[int] = []
                for y in range(height):
                    row = px[y * xsize : (y + 1) * xsize]
                    idxs: list[int] = []
                    for p in row:
                        g = (p >> 8) & 0xFF
                        for k in range(per):
                            idxs.append((g >> (k * ibits)) & ((1 << ibits) - 1))
                    out.extend(
                        palette[i] if i < len(palette) else 0
                        for i in idxs[:orig_w]
                    )
                px = out
                xsize = orig_w
            else:
                px = [
                    palette[(p >> 8) & 0xFF] if ((p >> 8) & 0xFF) < len(palette) else 0
                    for p in px
                ]

    rgba = bytearray()
    for argb in px:
        rgba += bytes(
            (
                (argb >> 16) & 0xFF,
                (argb >> 8) & 0xFF,
                argb & 0xFF,
                (argb >> 24) & 0xFF,
            )
        )
    return {
        "width": width,
        "height": height,
        "channels": 4,
        "pixels": bytes(rgba),
    }


def encode_webp_lossy(
    width: int, height: int, pixels: bytes, *, quality: float = 75.0
) -> bytes:
    """Encode RGBA as LOSSY WebP through the system libwebp (fixture
    generation for the lossy decode path; deterministic for a fixed
    library version). Raises NotImplementedError when the library is
    absent — same availability contract as _decode_lossy_system."""
    import ctypes

    lib = _libwebp()
    if lib is None:
        raise NotImplementedError(
            "lossy WebP encoding needs the system libwebp"
        )
    if len(pixels) != width * height * 4:
        raise ValueError("pixel buffer size mismatch")
    enc = lib.WebPEncodeRGBA
    enc.restype = ctypes.c_size_t
    enc.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    out = ctypes.c_void_p()
    n = enc(pixels, width, height, width * 4, quality, ctypes.byref(out))
    if not n or not out.value:
        raise ValueError("webp: lossy encode failed")
    try:
        data = ctypes.string_at(out.value, n)
    finally:
        lib.WebPFree(out)
    return data


# --- encoder (literal-only VP8L) ----------------------------------------


def encode_webp(width: int, height: int, pixels: bytes, *, channels: int = 4) -> bytes:
    """Encode RGBA (or RGB) as lossless WebP: no transforms, no cache,
    one prefix group, literal coding only."""
    if channels == 3:
        rgba = bytearray()
        for i in range(width * height):
            rgba += pixels[3 * i : 3 * i + 3] + b"\xff"
        pixels = bytes(rgba)
    elif channels != 4:
        raise ValueError("channels must be 3 or 4")
    if len(pixels) != width * height * 4:
        raise ValueError("pixel buffer size mismatch")

    w = _BitWriter()
    w.bits(width - 1, 14)
    w.bits(height - 1, 14)
    w.bits(1, 1)  # alpha hint
    w.bits(0, 3)  # version
    w.bits(0, 1)  # no transforms
    w.bits(0, 1)  # no color cache
    w.bits(0, 1)  # no meta prefix

    gs = [pixels[4 * i + 1] for i in range(width * height)]
    rs = [pixels[4 * i] for i in range(width * height)]
    bs = [pixels[4 * i + 2] for i in range(width * height)]
    as_ = [pixels[4 * i + 3] for i in range(width * height)]

    def freqs(vals, size):
        f: dict[int, int] = {}
        for v in vals:
            f[v] = f.get(v, 0) + 1
        return f

    g_len = _build_lengths(freqs(gs, 280))
    g_len += [0] * (280 - len(g_len))
    r_len = _build_lengths(freqs(rs, 256))
    r_len += [0] * (256 - len(r_len))
    b_len = _build_lengths(freqs(bs, 256))
    b_len += [0] * (256 - len(b_len))
    a_len = _build_lengths(freqs(as_, 256))
    a_len += [0] * (256 - len(a_len))
    d_len = [0] * 40
    d_len[0] = 1  # unused but a valid single-symbol code must exist

    for lengths in (g_len, r_len, b_len, a_len, d_len):
        _write_prefix_code(w, lengths)

    g_codes = _canonical_codes(g_len)
    r_codes = _canonical_codes(r_len)
    b_codes = _canonical_codes(b_len)
    a_codes = _canonical_codes(a_len)

    def put(codes, sym):
        if len(codes) == 1:
            return  # single-symbol codes consume zero bits (spec)
        c, k = codes[sym]
        for bi in range(k - 1, -1, -1):
            w.bits((c >> bi) & 1, 1)

    for i in range(width * height):
        put(g_codes, gs[i])
        put(r_codes, rs[i])
        put(b_codes, bs[i])
        put(a_codes, as_[i])

    payload = b"\x2f" + w.flush()
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def synthetic_webp_pixels(media_id: int) -> tuple[int, int, bytes]:
    """Deterministic RGBA test buffer (w, h, bytes)."""
    w = 16 + (media_id % 4) * 10
    h = 12 + (media_id % 3) * 8
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes(
                (
                    (x * 11 + media_id * 7) % 256,
                    (y * 13) % 256,
                    ((x ^ y) * 5) % 256,
                    255 if (x + y) % 7 else 128,
                )
            )
    return w, h, bytes(px)
