"""WebP-lossless (VP8L) codec tests: encoder round-trips plus
hand-built streams for the decoder-only paths (LZ77 backrefs, color
cache, subtract-green, color-indexing with sub-byte packing, predictor
transform, simple-code transmission order)."""

import struct

from duckdb_psql_spark.operators import webp as W


def _wrap(wb):
    payload = b"\x2f" + wb.flush()
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _header(w_, width, height):
    w_.bits(width - 1, 14)
    w_.bits(height - 1, 14)
    w_.bits(1, 1)
    w_.bits(0, 3)


def _put(w_, codes, sym):
    if len(codes) == 1:
        return
    c, k = codes[sym]
    for b in range(k - 1, -1, -1):
        w_.bits((c >> b) & 1, 1)


def _simple(w_, syms):
    w_.bits(1, 1)
    w_.bits(len(syms) - 1, 1)
    first = syms[0]
    if first > 1:
        w_.bits(1, 1)
        w_.bits(first, 8)
    else:
        w_.bits(0, 1)
        w_.bits(first, 1)
    if len(syms) == 2:
        w_.bits(syms[1], 8)
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    return {syms[0]: (0, 0)}


def _two(w_, a, b):
    return _simple(w_, [a, b]) if a != b else _simple(w_, [a])


def test_webp_roundtrip_exact():
    for i in range(12):
        w, h, px = W.synthetic_webp_pixels(i)
        data = W.encode_webp(w, h, px)
        assert W.is_webp(data)
        d = W.decode_webp(data)
        assert (d["width"], d["height"], d["channels"]) == (w, h, 4)
        assert d["pixels"] == px
    # RGB input + constant channel (single-symbol zero-bit code)
    w, h = 9, 7
    rgb = bytes(b for i in range(w * h) for b in ((i * 3) % 256, 77, (i * 5) % 256))
    d = W.decode_webp(W.encode_webp(w, h, rgb, channels=3))
    assert d["pixels"] == bytes(
        b for i in range(w * h) for b in ((i * 3) % 256, 77, (i * 5) % 256, 255)
    )


def test_webp_lz77_and_color_cache():
    A = (255 << 24) | (1 << 16) | (10 << 8) | 2
    cache_idx = ((0x1E35A7BD * A) & 0xFFFFFFFF) >> (32 - 2)
    w_ = W._BitWriter()
    _header(w_, 5, 1)
    w_.bits(0, 1)  # no transforms
    w_.bits(1, 1)
    w_.bits(2, 4)  # color cache, 4 entries
    w_.bits(0, 1)  # no meta prefix
    g_len = [0] * (256 + 24 + 4)
    for s in (10, 256 + 1, 256 + 24 + cache_idx):
        g_len[s] = 2
    W._write_prefix_code(w_, g_len)
    gc = W._canonical_codes(g_len)
    rc = _simple(w_, [1])
    bc = _simple(w_, [2])
    ac = _simple(w_, [255])
    dc = _simple(w_, [1])  # dist prefix 1 → value 2 → (1,0) → dist 1
    _put(w_, gc, 10); _put(w_, rc, 1); _put(w_, bc, 2); _put(w_, ac, 255)
    _put(w_, gc, 256 + 1); _put(w_, dc, 1)  # copy 2 @ dist 1
    _put(w_, gc, 256 + 1); _put(w_, dc, 1)  # copy 2 @ dist 1
    d = W.decode_webp(_wrap(w_))
    assert d["pixels"] == bytes((1, 10, 2, 255)) * 5

    # cache-hit path
    w2 = W._BitWriter()
    _header(w2, 2, 1)
    w2.bits(0, 1); w2.bits(1, 1); w2.bits(2, 4); w2.bits(0, 1)
    g2 = [0] * (256 + 24 + 4)
    g2[10] = 1
    g2[256 + 24 + cache_idx] = 1
    W._write_prefix_code(w2, g2)
    g2c = W._canonical_codes(g2)
    r2 = _simple(w2, [1]); b2 = _simple(w2, [2]); a2 = _simple(w2, [255])
    _simple(w2, [0])
    _put(w2, g2c, 10); _put(w2, r2, 1); _put(w2, b2, 2); _put(w2, a2, 255)
    _put(w2, g2c, 256 + 24 + cache_idx)
    assert W.decode_webp(_wrap(w2))["pixels"] == bytes((1, 10, 2, 255)) * 2


def test_webp_subtract_green():
    w3 = W._BitWriter()
    _header(w3, 2, 1)
    w3.bits(1, 1); w3.bits(2, 2)  # subtract-green
    w3.bits(0, 1)  # end of transforms
    w3.bits(0, 1); w3.bits(0, 1)  # no cache, no meta
    g3 = [0] * (256 + 24)
    g3[40] = 1
    W._write_prefix_code(w3, g3)
    g3c = W._canonical_codes(g3)
    r3 = _simple(w3, [60]); b3 = _simple(w3, [20]); a3 = _simple(w3, [255])
    _simple(w3, [0])
    for _ in range(2):
        _put(w3, g3c, 40); _put(w3, r3, 60); _put(w3, b3, 20); _put(w3, a3, 255)
    assert W.decode_webp(_wrap(w3))["pixels"] == bytes((100, 40, 60, 255)) * 2


def test_webp_color_indexing_packed():
    w4 = W._BitWriter()
    _header(w4, 8, 1)
    w4.bits(1, 1); w4.bits(3, 2)  # color-indexing
    w4.bits(1, 8)  # 2 colors
    # palette sub-image (delta-coded): c0=(a255,r10,g20,b30), delta=(0,5,5,5)
    w4.bits(0, 1)  # palette image: no cache
    g4 = [0] * (256 + 24)
    g4[20] = 1
    g4[5] = 1
    W._write_prefix_code(w4, g4)
    g4c = W._canonical_codes(g4)
    r4 = _two(w4, 10, 5); b4 = _two(w4, 30, 5); a4 = _two(w4, 255, 0)
    _simple(w4, [0])
    _put(w4, g4c, 20); _put(w4, r4, 10); _put(w4, b4, 30); _put(w4, a4, 255)
    _put(w4, g4c, 5); _put(w4, r4, 5); _put(w4, b4, 5); _put(w4, a4, 0)
    w4.bits(0, 1)  # end of transforms
    w4.bits(0, 1); w4.bits(0, 1)  # main: no cache, no meta
    # 8 pixels packed into one green byte, LSB-first: 0,1,0,1,1,0,1,0
    g5 = [0] * (256 + 24)
    g5[0x5A] = 1
    W._write_prefix_code(w4, g5)
    g5c = W._canonical_codes(g5)
    for s in ([0], [0], [0], [0]):
        _simple(w4, s)
    _put(w4, g5c, 0x5A)
    d = W.decode_webp(_wrap(w4))
    pal = [bytes((10, 20, 30, 255)), bytes((15, 25, 35, 255))]
    assert d["pixels"] == b"".join(pal[i] for i in (0, 1, 0, 1, 1, 0, 1, 0))


def test_webp_predictor_left_mode():
    w6 = W._BitWriter()
    _header(w6, 3, 1)
    w6.bits(1, 1); w6.bits(0, 2)  # predictor
    w6.bits(0, 3)  # size_bits=2 → one 4x4 tile
    # tile sub-image: mode 1 (Left) in green channel
    w6.bits(0, 1)
    gt = [0] * (256 + 24)
    gt[1] = 1
    W._write_prefix_code(w6, gt)
    gtc = W._canonical_codes(gt)
    rt = _simple(w6, [0]); bt = _simple(w6, [0]); at = _simple(w6, [255])
    _simple(w6, [0])
    _put(w6, gtc, 1); _put(w6, rt, 0); _put(w6, bt, 0); _put(w6, at, 255)
    w6.bits(0, 1)  # end of transforms
    w6.bits(0, 1); w6.bits(0, 1)  # no cache, no meta
    gm = [0] * (256 + 24)
    gm[60] = 1
    gm[2] = 1
    W._write_prefix_code(w6, gm)
    gmc = W._canonical_codes(gm)
    rm = _two(w6, 50, 1); bm = _two(w6, 70, 3)
    _simple(w6, [0])  # alpha residual 0 everywhere
    _simple(w6, [0])  # distances unused
    _put(w6, gmc, 60); _put(w6, rm, 50); _put(w6, bm, 70)
    for _ in range(2):
        _put(w6, gmc, 2); _put(w6, rm, 1); _put(w6, bm, 3)
    d = W.decode_webp(_wrap(w6))
    assert d["pixels"] == (
        bytes((50, 60, 70, 255))
        + bytes((51, 62, 73, 255))
        + bytes((52, 64, 76, 255))
    )


def test_webp_distributed_decode(spark):
    import zlib

    from duckdb_psql_spark.operators.multimodal import (
        decode_images,
        synthetic_webp_media,
    )

    out = {
        r.media_id: r
        for r in decode_images(synthetic_webp_media(spark, 9)).collect()
    }
    for i in range(9):
        w, h, px = W.synthetic_webp_pixels(i)
        r = out[i]
        assert (r.width, r.height, r.channels) == (w, h, 4)
        assert r.pixel_crc == (zlib.crc32(px) & 0xFFFFFFFF)


def test_lossy_vp8_system_kernel_roundtrip():
    """Round 11: lossy VP8 decode through the in-container libwebp (the
    documented deployment-kernel swap made real). Encode a known
    gradient lossy, decode it back: exact dimensions, near-original
    pixels (quality 75), full alpha."""
    import statistics

    from duckdb_psql_spark.operators.webp import (
        _libwebp,
        decode_webp,
        encode_webp_lossy,
    )

    if _libwebp() is None:
        import pytest

        pytest.skip("system libwebp absent: documented contract stands")
    w, h = 40, 28
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes((x * 6 % 256, y * 9 % 256, (x + y) * 4 % 256, 255))
    data = encode_webp_lossy(w, h, bytes(px), quality=75.0)
    assert data[12:16] == b"VP8 "  # really lossy, not VP8L
    d = decode_webp(data)
    assert (d["width"], d["height"], d["channels"]) == (w, h, 4)
    errs = [abs(d["pixels"][i] - px[i]) for i in range(0, len(px))]
    assert statistics.mean(errs) < 12  # lossy-but-close
    assert all(d["pixels"][i] == 255 for i in range(3, len(px), 4))  # alpha
    # corrupt stream: loud per-payload error, never a crash
    import pytest

    bad = data[:20] + b"\x00\x00\x00\x00" + data[24:]
    with pytest.raises(ValueError, match="lossy decode failed"):
        decode_webp(bad)


def test_vp8l_decoder_cross_validated_by_libwebp():
    """The from-scratch VP8L DECODER and ENCODER are externally
    validated: the system libwebp decodes our encoder's output to the
    byte-identical RGBA our decoder produces."""
    import ctypes

    from duckdb_psql_spark.operators.webp import (
        _libwebp,
        decode_webp,
        encode_webp,
        synthetic_webp_pixels,
    )

    lib = _libwebp()
    if lib is None:
        import pytest

        pytest.skip("system libwebp absent")
    for i in (0, 5, 11):
        w, h, px = synthetic_webp_pixels(i)
        data = encode_webp(w, h, px)
        ours = decode_webp(data)
        assert ours["pixels"] == px
        wi = ctypes.c_int()
        hi = ctypes.c_int()
        buf = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(wi), ctypes.byref(hi))
        assert buf
        theirs = ctypes.string_at(buf, wi.value * hi.value * 4)
        lib.WebPFree(buf)
        assert (wi.value, hi.value) == (w, h)
        assert theirs == px
