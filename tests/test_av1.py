"""AV1 kernel (operators/av1.py, round 12): ctypes bindings to the
container's system libaom (encode + decode) and dav1d (independent
decode), with empirically-validated ABI layouts. The strongest check is
the cross-decoder one: the SAME bitstream decoded by two independent
implementations must be pixel-identical (AV1 decode is normative)."""

from __future__ import annotations

import zlib

import pytest

av1 = pytest.importorskip("duckdb_psql_spark.operators.av1")

pytestmark = pytest.mark.skipif(
    not av1.av1_available(), reason="system AV1 kernel absent"
)


def test_round_trip_dims_and_determinism():
    clip = av1.synthetic_av1(5, 32, 24, n_frames=3)
    assert clip == av1.synthetic_av1(5, 32, 24, n_frames=3)  # deterministic
    frames = av1.decode_av1(clip)
    assert len(frames) == 3
    assert all(f.w == 32 and f.h == 24 for f in frames)
    assert all(len(f.y) == 32 * 24 and len(f.u) == 16 * 12 for f in frames)
    # all-intra: frames differ (the gradient shifts per frame)
    assert frames[0].y != frames[1].y


def test_cross_decoder_pixel_identity():
    for seed, w, h, nf in ((1, 32, 24, 4), (2, 64, 48, 2), (7, 48, 32, 5)):
        clip = av1.synthetic_av1(seed, w, h, n_frames=nf)
        fd = av1.decode_av1(clip)
        fa = av1.decode_av1_aom(clip)
        assert len(fd) == len(fa) == nf
        for a, b in zip(fd, fa):
            assert (a.w, a.h) == (b.w, b.h) == (w, h)
            assert a.y == b.y and a.u == b.u and a.v == b.v


def test_temporal_unit_splitter():
    clip = av1.synthetic_av1(3, 32, 24, n_frames=4)
    tus = av1.split_temporal_units(clip)
    assert len(tus) == 4
    assert b"".join(tus) == clip
    # every TU starts with a temporal-delimiter OBU (type 2)
    assert all(((tu[0] >> 3) & 0xF) == 2 for tu in tus)


def test_corrupt_payload_raises_kernel_error():
    with pytest.raises(av1.Av1KernelError):
        av1.decode_av1(b"\x12\x00" + b"\xff" * 64)


def test_sample_frames_real_decode(spark):
    from duckdb_psql_spark.operators.multimodal import (
        sample_frames,
        synthetic_media,
    )

    media = synthetic_media(spark, 24)
    rows = sample_frames(media, every_ms=500).collect()
    vids = {r.media_id for r in rows}
    assert vids == {2, 5, 8, 11, 14, 17, 20, 23}
    assert all(r.err is None for r in rows)
    assert all(r.frame_w == 32 and r.frame_h == 24 for r in rows)
    # one sampled frame's luma matches a direct dav1d decode of the
    # same payload at the same position
    payload = {
        m.media_id: bytes(m.content)
        for m in media.filter("kind = 'video'").collect()
    }
    r0 = next(r for r in rows if r.media_id == 2 and r.frame_ts_ms == 500)
    frames = av1.decode_av1(payload[2])
    dur = len(frames) * 250  # generator contract: 4 fps
    idx = min(len(frames) - 1, 500 * len(frames) // dur)
    assert zlib.crc32(bytes(r0.frame)) == zlib.crc32(frames[idx].y)


def test_sample_frames_error_contract(spark):
    from duckdb_psql_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    rows = [
        (0, "video", "mp4", b"\x00" * 32, None, None, 1000, 32),
        (1, "video", "av1", b"\x12\x00" + b"\xff" * 32, None, None, 500, 34),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in sample_frames(df, every_ms=1000).collect()}
    assert "unsupported video codec: mp4" in out[0].err
    assert out[0].frame is None
    assert "decode failed" in out[1].err
    assert out[1].frame is None
