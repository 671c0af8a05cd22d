"""AV1 video encode/decode through the container's system codecs.

Round 12 closes the video-frame-decode stub the same way round 11
closed lossy WebP (operators/webp.py:503): a hand-rolled ctypes binding
to public system libraries — ``libaom.so.3`` (AV1 encoder+decoder,
v3.6.0) and ``libdav1d.so.6`` (VideoLAN's independent AV1 decoder,
1.0.0). No headers are installed in the container, so the bindings pin
the PUBLIC C ABI (aom/aom_encoder.h, dav1d/picture.h — stable per
soname) and VALIDATE it at first use: ``aom_codec_enc_config_default``
must produce the documented GOOD-profile defaults at the expected
offsets (g_w=320/g_h=240/g_timebase=1/30), the init calls probe the ABI
version argument until the library stops returning
AOM_CODEC_ABI_MISMATCH, and a 16×16 self-test pattern must round-trip
encode→decode with matching dims before any user payload is touched —
any mismatch raises the deployment-kernel error instead of risking a
mis-layout read.

Two INDEPENDENT decoder implementations exist here (libaom's and
dav1d's), which gives the differential entry a real oracle: the engine
decodes with dav1d, the oracle side decodes the same payloads with
libaom, and the per-frame luma statistics must agree — the same
cross-validation story as the from-scratch VP8L codec vs libwebp
(webp.py round 11).

The reference engine has no video path (its 200-LoC core rewrites text
only, /root/reference/src/psql_extension.cpp:28-125); this implements
the charter's multimodal frame-sampling operator for real.
"""

from __future__ import annotations

import ctypes
import struct
from dataclasses import dataclass

_AOM_IMG_FMT_I420 = 0x102
_CFG_BYTES = 16384
_CTX_BYTES = 8192
_IMG_BYTES = 1024
_PIC_BYTES = 1024
_SET_BYTES = 1024
_DATA_BYTES = 256
# aom_codec_enc_cfg_t offsets (uint32 index * 4), validated at init
_OFF_G_W = 12
_OFF_G_H = 16
_OFF_TB_NUM = 40
_OFF_TB_DEN = 44
# aom_image_t: planes[3] at 64, stride[3] ints at 88 (validated via
# img_wrap scan); Dav1dPicture: data[3] at 16, stride[2] at 40,
# p{w,h,layout,bpc} at 56 (dav1d 1.x picture.h)
_AOM_IMG_PLANES = 64
_AOM_IMG_STRIDE = 88

_state: dict = {}


class Av1KernelError(RuntimeError):
    """The system AV1 kernel is absent or failed ABI validation."""


def _libs():
    if "err" in _state:
        raise Av1KernelError(_state["err"])
    if "aom" in _state:
        return _state["aom"], _state["dav"]
    try:
        aom = ctypes.CDLL("libaom.so.3")
        dav = ctypes.CDLL("libdav1d.so.6")
    except OSError as e:  # pragma: no cover - container always has them
        _state["err"] = f"system AV1 libraries unavailable: {e}"
        raise Av1KernelError(_state["err"]) from e
    aom.aom_codec_av1_cx.restype = ctypes.c_void_p
    aom.aom_codec_av1_dx.restype = ctypes.c_void_p
    aom.aom_img_wrap.restype = ctypes.c_void_p
    aom.aom_codec_get_cx_data.restype = ctypes.c_void_p
    aom.aom_codec_get_frame.restype = ctypes.c_void_p
    aom.aom_codec_error.restype = ctypes.c_char_p
    aom.aom_codec_error.argtypes = [ctypes.c_void_p]
    dav.dav1d_data_create.restype = ctypes.c_void_p
    # ABI validation: documented config defaults at the pinned offsets
    cfg = (ctypes.c_uint8 * _CFG_BYTES)()
    iface = aom.aom_codec_av1_cx()
    if aom.aom_codec_enc_config_default(
        ctypes.c_void_p(iface), ctypes.byref(cfg), 1
    ) != 0:
        _state["err"] = "aom_codec_enc_config_default failed"
        raise Av1KernelError(_state["err"])
    defaults = struct.unpack_from("<II", cfg, _OFF_G_W)
    tb = struct.unpack_from("<II", cfg, _OFF_TB_NUM)
    if defaults != (320, 240) or tb != (1, 30):
        _state["err"] = (
            f"aom_codec_enc_cfg_t layout mismatch: g_w/g_h={defaults}, "
            f"timebase={tb} (expected (320, 240) and (1, 30))"
        )
        raise Av1KernelError(_state["err"])
    # probe the ABI version arguments once
    ctx = (ctypes.c_uint8 * _CTX_BYTES)()
    enc_ver = next(
        (
            v for v in range(64)
            if aom.aom_codec_enc_init_ver(
                ctypes.byref(ctx), ctypes.c_void_p(iface),
                ctypes.byref(cfg), ctypes.c_long(0), v,
            ) == 0
        ),
        None,
    )
    if enc_ver is None:
        _state["err"] = "no accepted aom encoder ABI version in 0..63"
        raise Av1KernelError(_state["err"])
    aom.aom_codec_destroy(ctypes.byref(ctx))
    dctx = (ctypes.c_uint8 * _CTX_BYTES)()
    diface = aom.aom_codec_av1_dx()
    dec_ver = next(
        (
            v for v in range(64)
            if aom.aom_codec_dec_init_ver(
                ctypes.byref(dctx), ctypes.c_void_p(diface), None,
                ctypes.c_long(0), v,
            ) == 0
        ),
        None,
    )
    if dec_ver is None:
        _state["err"] = "no accepted aom decoder ABI version in 0..63"
        raise Av1KernelError(_state["err"])
    aom.aom_codec_destroy(ctypes.byref(dctx))
    _state.update(aom=aom, dav=dav, enc_ver=enc_ver, dec_ver=dec_ver)
    # end-to-end self test before any user payload: a 16x16 flat frame
    # must round-trip with matching dims through BOTH decoders
    try:
        probe = encode_av1([bytes([128]) * (16 * 16 + 2 * 64)], 16, 16)
        fr_d = decode_av1(probe)
        fr_a = decode_av1_aom(probe)
        if not (
            len(fr_d) == len(fr_a) == 1
            and fr_d[0].w == fr_a[0].w == 16
            and fr_d[0].h == fr_a[0].h == 16
            and fr_d[0].y == fr_a[0].y
        ):
            raise Av1KernelError("AV1 self-test round-trip mismatch")
    except Av1KernelError:
        _state.pop("aom", None), _state.pop("dav", None)
        _state["err"] = "AV1 self-test round-trip failed"
        raise
    return _state["aom"], _state["dav"]


@dataclass
class Av1Frame:
    w: int
    h: int
    y: bytes  # luma plane, tightly packed w*h
    u: bytes  # chroma, (w//2)*(h//2)
    v: bytes


def encode_av1(
    frames_i420: list[bytes], w: int, h: int, fps: int = 4
) -> bytes:
    """Encode I420 frames (each ``w*h + 2*(w//2)*(h//2)`` bytes) into a
    low-overhead AV1 OBU stream (realtime profile, all-intra via forced
    keyframes so every frame decodes independently)."""
    aom, _ = _libs()
    iface = aom.aom_codec_av1_cx()
    cfg = (ctypes.c_uint8 * _CFG_BYTES)()
    if aom.aom_codec_enc_config_default(
        ctypes.c_void_p(iface), ctypes.byref(cfg), 1
    ) != 0:
        raise Av1KernelError("enc_config_default failed")
    struct.pack_into("<I", cfg, _OFF_G_W, w)
    struct.pack_into("<I", cfg, _OFF_G_H, h)
    struct.pack_into("<I", cfg, _OFF_TB_NUM, 1)
    struct.pack_into("<I", cfg, _OFF_TB_DEN, fps)
    ctx = (ctypes.c_uint8 * _CTX_BYTES)()
    if aom.aom_codec_enc_init_ver(
        ctypes.byref(ctx), ctypes.c_void_p(iface), ctypes.byref(cfg),
        ctypes.c_long(0), _state["enc_ver"],
    ) != 0:
        raise Av1KernelError("aom encoder init failed")
    try:
        out = bytearray()

        def drain():
            it = ctypes.c_void_p(0)
            while True:
                pkt = aom.aom_codec_get_cx_data(
                    ctypes.byref(ctx), ctypes.byref(it)
                )
                if not pkt:
                    return
                kind = struct.unpack_from(
                    "<i", ctypes.string_at(pkt, 8), 0
                )[0]
                if kind == 0:  # AOM_CODEC_CX_FRAME_PKT
                    bufp, sz = struct.unpack_from(
                        "<QQ", ctypes.string_at(pkt, 24), 8
                    )
                    out.extend(ctypes.string_at(bufp, sz))

        need = w * h + 2 * (w // 2) * (h // 2)
        for idx, fr in enumerate(frames_i420):
            if len(fr) != need:
                raise Av1KernelError(
                    f"frame {idx}: {len(fr)} bytes, expected {need}"
                )
            buf = (ctypes.c_uint8 * need).from_buffer_copy(fr)
            img = (ctypes.c_uint8 * _IMG_BYTES)()
            if not aom.aom_img_wrap(
                ctypes.byref(img), _AOM_IMG_FMT_I420, w, h, 1,
                ctypes.byref(buf),
            ):
                raise Av1KernelError("aom_img_wrap failed")
            if aom.aom_codec_encode(
                ctypes.byref(ctx), ctypes.byref(img),
                ctypes.c_longlong(idx), ctypes.c_ulong(1),
                ctypes.c_long(1),  # AOM_EFLAG_FORCE_KF: all-intra
            ) != 0:
                raise Av1KernelError(
                    "aom_codec_encode: "
                    + (aom.aom_codec_error(ctypes.byref(ctx)) or b"?").decode()
                )
            drain()
        # flush
        if aom.aom_codec_encode(
            ctypes.byref(ctx), None, ctypes.c_longlong(-1),
            ctypes.c_ulong(0), ctypes.c_long(0),
        ) == 0:
            drain()
        return bytes(out)
    finally:
        aom.aom_codec_destroy(ctypes.byref(ctx))


def _read_aom_image(fptr: int) -> Av1Frame:
    raw = ctypes.string_at(fptr, 512)
    d_w, d_h = struct.unpack_from("<II", raw, 28)
    py, pu, pv = struct.unpack_from("<QQQ", raw, _AOM_IMG_PLANES)
    sy, su, sv = struct.unpack_from("<3i", raw, _AOM_IMG_STRIDE)
    cw, ch = d_w // 2, d_h // 2

    def plane(ptr, stride, width, height):
        data = ctypes.string_at(ptr, stride * height)
        return b"".join(
            data[r * stride : r * stride + width] for r in range(height)
        )

    return Av1Frame(
        d_w, d_h,
        plane(py, sy, d_w, d_h), plane(pu, su, cw, ch), plane(pv, sv, cw, ch),
    )


def _leb128(data: bytes, i: int) -> tuple[int, int]:
    v = shift = 0
    while True:
        b = data[i]
        v |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return v, i
        shift += 7


def split_temporal_units(payload: bytes) -> list[bytes]:
    """Split a low-overhead AV1 OBU stream at temporal delimiters —
    libaom's decoder consumes ONE temporal unit per aom_codec_decode
    call (feeding the whole stream decodes everything but only the last
    frame stays retrievable)."""
    tus: list[bytes] = []
    i = start = 0
    n = len(payload)
    while i < n:
        hdr = payload[i]
        obu_type = (hdr >> 3) & 0xF
        has_ext = (hdr >> 2) & 1
        has_size = (hdr >> 1) & 1
        j = i + 1 + (1 if has_ext else 0)
        if not has_size:
            break  # size-unframed OBU extends to EOS: one final TU
        size, j = _leb128(payload, j)
        if obu_type == 2 and i > start:  # OBU_TEMPORAL_DELIMITER
            tus.append(payload[start:i])
            start = i
        i = j + size
    tus.append(payload[start:])
    return tus


def decode_av1_aom(payload: bytes) -> list[Av1Frame]:
    """Decode an AV1 OBU stream with LIBAOM's decoder — the independent
    cross-validator for the dav1d path (and the oracle-side decoder of
    the differential entry)."""
    aom, _ = _libs()
    iface = aom.aom_codec_av1_dx()
    ctx = (ctypes.c_uint8 * _CTX_BYTES)()
    if aom.aom_codec_dec_init_ver(
        ctypes.byref(ctx), ctypes.c_void_p(iface), None, ctypes.c_long(0),
        _state["dec_ver"],
    ) != 0:
        raise Av1KernelError("aom decoder init failed")
    try:
        frames = []
        for tu in split_temporal_units(payload):
            if aom.aom_codec_decode(
                ctypes.byref(ctx), tu, len(tu), None
            ) != 0:
                raise Av1KernelError(
                    "aom_codec_decode: "
                    + (aom.aom_codec_error(ctypes.byref(ctx)) or b"?").decode()
                )
            it = ctypes.c_void_p(0)
            while True:
                f = aom.aom_codec_get_frame(
                    ctypes.byref(ctx), ctypes.byref(it)
                )
                if not f:
                    break
                frames.append(_read_aom_image(f))
        return frames
    finally:
        aom.aom_codec_destroy(ctypes.byref(ctx))


def decode_av1(payload: bytes, max_frames: int | None = None) -> list[Av1Frame]:
    """Decode an AV1 OBU stream with dav1d (single-threaded,
    frame-delay 1: fully synchronous, bounded memory)."""
    _, dav = _libs()
    st = (ctypes.c_uint8 * _SET_BYTES)()
    dav.dav1d_default_settings(ctypes.byref(st))
    struct.pack_into("<i", st, 0, 1)  # n_threads
    struct.pack_into("<i", st, 4, 1)  # max_frame_delay
    dctx = ctypes.c_void_p()
    if dav.dav1d_open(ctypes.byref(dctx), ctypes.byref(st)) != 0:
        raise Av1KernelError("dav1d_open failed")
    frames: list[Av1Frame] = []
    try:
        dd = (ctypes.c_uint8 * _DATA_BYTES)()
        bufp = dav.dav1d_data_create(
            ctypes.byref(dd), ctypes.c_size_t(len(payload))
        )
        if not bufp:
            raise Av1KernelError("dav1d_data_create failed")
        ctypes.memmove(bufp, payload, len(payload))
        pending = True
        for _ in range(100000):  # loud bound, never silent-infinite
            if pending:
                r = dav.dav1d_send_data(dctx, ctypes.byref(dd))
                if r == 0:
                    sz = struct.unpack_from("<Q", bytes(dd[:16]), 8)[0]
                    pending = sz > 0
                elif r != -11:  # -EAGAIN: drain a picture first
                    raise Av1KernelError(f"dav1d_send_data error {r}")
            pic = (ctypes.c_uint8 * _PIC_BYTES)()
            r = dav.dav1d_get_picture(dctx, ctypes.byref(pic))
            if r == 0:
                praw = bytes(pic[:128])
                d0, d1, d2 = struct.unpack_from("<QQQ", praw, 16)
                s0, s1 = struct.unpack_from("<qq", praw, 40)
                w, h, _layout, bpc = struct.unpack_from("<4i", praw, 56)
                if bpc != 8:
                    dav.dav1d_picture_unref(ctypes.byref(pic))
                    raise Av1KernelError(f"unsupported bit depth {bpc}")
                cw, ch = w // 2, h // 2

                def plane(ptr, stride, width, height):
                    data = ctypes.string_at(ptr, stride * height)
                    return b"".join(
                        data[r_ * stride : r_ * stride + width]
                        for r_ in range(height)
                    )

                frames.append(Av1Frame(
                    w, h, plane(d0, s0, w, h),
                    plane(d1, s1, cw, ch), plane(d2, s1, cw, ch),
                ))
                dav.dav1d_picture_unref(ctypes.byref(pic))
                if max_frames is not None and len(frames) >= max_frames:
                    return frames
            elif r == -11:
                if not pending:
                    return frames
            else:
                raise Av1KernelError(f"dav1d_get_picture error {r}")
        raise Av1KernelError("dav1d decode loop bound exceeded")
    finally:
        dav.dav1d_close(ctypes.byref(dctx))


def synthetic_av1(seed: int, w: int = 32, h: int = 24, n_frames: int = 4,
                  fps: int = 4) -> bytes:
    """Deterministic small AV1 clip: per-frame gradient pattern keyed by
    (seed, frame index) — the synthetic_media video payload."""
    need_c = (w // 2) * (h // 2)
    frames = []
    for f in range(n_frames):
        y = bytes(((x * 7 + yy * 13 + seed * 31 + f * 57) % 251)
                  for yy in range(h) for x in range(w))
        u = bytes([(100 + seed * 3 + f * 11) % 256]) * need_c
        v = bytes([(200 + seed * 5 + f * 17) % 256]) * need_c
        frames.append(y + u + v)
    return encode_av1(frames, w, h, fps)


def av1_available() -> bool:
    try:
        _libs()
        return True
    except Av1KernelError:
        return False
