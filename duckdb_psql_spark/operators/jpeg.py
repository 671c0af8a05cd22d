"""Minimal pure-Python baseline JPEG codec (stdlib + numpy).

Companion to the PNG codec (``operators/png.py``): gives the multimodal
operators a REAL decode path for the format real corpora actually use.
Everything here is from the public JPEG spec (ITU-T T.81 / ISO 10918-1)
and the JFIF note: marker segments, canonical Huffman coding, zigzag
run-length entropy, 8x8 DCT with quantization, YCbCr color.

Decoder: baseline sequential (SOF0/SOF1) AND progressive (SOF2), 8-bit,
sampling factors 1-2 (covers 4:4:4 / 4:2:2 / 4:2:0), restart markers,
grayscale or 3-component YCbCr. Progressive support is the full T.81
Annex G successive-approximation algorithm: interleaved DC scans +
non-interleaved spectral-selection AC scans, DC/AC refinement scans
with EOB runs and correction bits, per-scan Huffman table snapshots.
Arithmetic coding raises NotImplementedError.

Encoder: baseline 4:4:4 / 4:2:0 (or single-component grayscale) with
frequency-built canonical Huffman tables (the spec allows any DHT; the
decoder reconstructs codes from the file, so nothing depends on the
Annex K example tables) and simple deterministic quantization ramps;
plus a progressive (SOF2) encoder over a DC(Al=1) → DC-refine →
AC(bands, Al=1) → AC-refine scan script, used to round-trip-test the
progressive decoder offline.

The zigzag order and DCT basis are *generated*, not transcribed, so
there is no table-transcription risk; tests assert T @ T.T == I and a
round-trip PSNR bound.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np


def _zigzag() -> list[tuple[int, int]]:
    order: list[tuple[int, int]] = []
    for s in range(15):
        rng = range(s + 1)
        idx = rng if s % 2 else reversed(rng)
        order.extend((i, s - i) for i in idx if i < 8 and s - i < 8)
    return order


_ZZ = _zigzag()  # 64 (row, col) pairs in JPEG zigzag order

# Orthonormal DCT-II basis: forward F = T @ B @ T.T, inverse B = T.T @ F @ T
_T = np.array(
    [
        [
            np.sqrt((1.0 if k == 0 else 2.0) / 8.0)
            * np.cos((2 * n + 1) * k * np.pi / 16.0)
            for n in range(8)
        ]
        for k in range(8)
    ]
)

# Deterministic quantization ramps (any table is valid JPEG; it travels
# in DQT). Mild enough for a useful round-trip, coarse enough to be a
# real lossy transform.
_Q_LUMA = np.array([[8 + 2 * (i + j) for j in range(8)] for i in range(8)])
_Q_CHROMA = np.array([[12 + 3 * (i + j) for j in range(8)] for i in range(8)])


def is_jpeg(data: bytes | None) -> bool:
    return bool(data) and len(data) >= 3 and bytes(data[:3]) == b"\xff\xd8\xff"


# ---------------------------------------------------------------------------
# canonical Huffman
# ---------------------------------------------------------------------------

_DUMMY = 256  # reserves the all-ones code (T.81 K.2); never emitted


def _build_table(freqs: dict[int, int]) -> tuple[list[int], list[int]]:
    """(bits[1..16] counts, symbols in canonical order) from frequencies."""
    f = {s: n for s, n in freqs.items() if n > 0}
    f[_DUMMY] = 1
    heap: list[tuple[int, list[int]]] = [(n, [s]) for s, n in f.items()]
    heapq.heapify(heap)
    length = dict.fromkeys(f, 0)
    if len(heap) == 1:
        length[heap[0][1][0]] = 1
    while len(heap) > 1:
        na, sa = heapq.heappop(heap)
        nb, sb = heapq.heappop(heap)
        for s in sa + sb:
            length[s] += 1
        heapq.heappush(heap, (na + nb, sorted(sa + sb)))
    bits = [0] * 33
    for s, ln in length.items():
        bits[min(ln, 32)] += 1
    # length-limit to 16 (T.81 K.3 Adjust_BITS)
    i = 32
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    # canonical symbol order: original length, then value — the dummy
    # (max length, max value) sorts last, so dropping one code from the
    # longest run removes exactly it
    order = sorted(f, key=lambda s: (length[s], s))
    maxlen = max(ln for ln in range(1, 17) if bits[ln] > 0)
    bits[maxlen] -= 1
    symbols = [s for s in order if s != _DUMMY]
    return bits[1:17], symbols


def _assign_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) by canonical assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[symbols[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits (spec F.1.2.3)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                return 0  # spec: pad past end with zero bits
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def take(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.bit()
        return v


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _extend(raw: int, size: int) -> int:
    if size == 0:
        return 0
    return raw if raw >= (1 << (size - 1)) else raw - (1 << size) + 1


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane → (n_blocks_v, n_blocks_h, 8, 8), edge-padded."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    return plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)


def _quantize_pixels(
    width: int, height: int, pixels: bytes, channels: int, subsample: bool
):
    """Pixels → per-component quantized zigzag DCT coefficients.

    Shared front half of the baseline and progressive encoders.
    Returns (comp_coefs, samp, qids, ncomp, mcux, mcuy, hmax, vmax);
    comp_coefs[ci] has shape (block_rows, block_cols, 64), MCU-padded.
    """
    arr = np.frombuffer(pixels, np.uint8).reshape(height, width, channels).astype(np.float64)
    if channels == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
        qtabs = [_Q_LUMA, _Q_CHROMA, _Q_CHROMA]
        qids = [0, 1, 1]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    elif channels == 1:
        planes = [arr[..., 0]]
        qtabs = [_Q_LUMA]
        qids = [0]
        samp = [(1, 1)]
    else:
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    ncomp = len(planes)
    hmax = max(h_ for h_, _ in samp)
    vmax = max(v_ for _, v_ in samp)
    if subsample and ncomp == 3:
        # 2x2 box-filter the chroma planes (pad odd dims by edge first)
        for ci in (1, 2):
            p = planes[ci]
            p = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), mode="edge")
            planes[ci] = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0

    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    zz_rows = [p for p, _ in _ZZ]
    zz_cols = [c for _, c in _ZZ]
    comp_coefs: list[np.ndarray] = []  # per comp: (bh, bw, 64) int zigzagged
    for (hi, vi), plane, q in zip(samp, planes, qtabs):
        # pad the plane so its block grid covers the full MCU grid
        tgt_h, tgt_w = mcuy * vi * 8, mcux * hi * 8
        plane = np.pad(
            plane,
            ((0, tgt_h - plane.shape[0]), (0, tgt_w - plane.shape[1])),
            mode="edge",
        )
        blocks = _to_blocks(plane) - 128.0
        coef = np.einsum("kn,bcnm,jm->bckj", _T, blocks, _T)
        quant = np.round(coef / q).astype(np.int32)
        comp_coefs.append(quant[:, :, zz_rows, zz_cols])
    return comp_coefs, samp, qids, ncomp, mcux, mcuy, hmax, vmax


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    *,
    channels: int = 3,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode raw 8-bit pixels (row-major RGB or grayscale) as baseline JPEG.

    ``subsample=True`` emits 4:2:0 chroma (2x2 luma sampling factors);
    ``restart_interval=N`` emits DRI + RSTn every N MCUs — both mainly
    exist so the decoder's real-world code paths are testable offline.
    """
    comp_coefs, samp, qids, ncomp, mcux, mcuy, hmax, vmax = _quantize_pixels(
        width, height, pixels, channels, subsample
    )

    def _block_symbols(cls: int, blk: np.ndarray, pred: list[int], ci: int):
        diff = int(blk[0]) - pred[ci]
        pred[ci] = int(blk[0])
        s = _category(diff)
        raw = diff if diff >= 0 else diff + (1 << s) - 1
        yield (("dc", cls), s, raw, s)
        run = 0
        last_nz = int(np.max(np.nonzero(blk)[0])) if np.any(blk[1:]) else 0
        for k in range(1, 64):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                yield (("ac", cls), 0xF0, 0, 0)  # ZRL
                run -= 16
            s = _category(v)
            raw = v if v >= 0 else v + (1 << s) - 1
            yield (("ac", cls), (run << 4) | s, raw, s)
            run = 0
            if k == last_nz:
                break
        if last_nz < 63:
            yield (("ac", cls), 0x00, 0, 0)  # EOB

    def _mcu_symbols(m: int, pred: list[int]):
        my, mx = divmod(m, mcux)
        for ci in range(ncomp):
            hi, vi = samp[ci]
            cls = 0 if ci == 0 else 1
            for v in range(vi):
                for hblk in range(hi):
                    blk = comp_coefs[ci][my * vi + v, mx * hi + hblk]
                    yield from _block_symbols(cls, blk, pred, ci)

    def _symbol_stream():
        """(table_key, huff_symbol, raw_bits, raw_len, mcu_index) in scan order."""
        pred = [0] * ncomp
        for m in range(mcux * mcuy):
            if restart_interval and m and m % restart_interval == 0:
                pred = [0] * ncomp
                yield ("RST", m, 0, 0)
            for tup in _mcu_symbols(m, pred):
                yield tup

    # pass 1: frequencies; pass 2: emit
    freqs: dict[tuple[str, int], dict[int, int]] = {}
    for key, sym, _raw, _n in _symbol_stream():
        if key == "RST":
            continue
        freqs.setdefault(key, {})[sym] = freqs.setdefault(key, {}).get(sym, 0) + 1
    tables = {key: _build_table(f) for key, f in freqs.items()}
    codes = {key: _assign_codes(*t) for key, t in tables.items()}
    w = _BitWriter()
    entropy = bytearray()
    nrst = 0
    for key, sym, raw, nbits in _symbol_stream():
        if key == "RST":
            entropy += w.flush()
            w = _BitWriter()
            entropy += bytes([0xFF, 0xD0 + (nrst % 8)])
            nrst += 1
            continue
        c, ln = codes[key][sym]
        w.put(c, ln)
        if nbits:
            w.put(raw, nbits)
    entropy += w.flush()
    entropy = bytes(entropy)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for qid, q in ([(0, _Q_LUMA), (1, _Q_CHROMA)] if ncomp == 3 else [(0, _Q_LUMA)]):
        body = bytes([qid]) + bytes(int(q[p][c]) for p, c in _ZZ)
        out += seg(0xFFDB, body)
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, qids[ci]])
    out += seg(0xFFC0, sof)
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    for (kind, cls), (bits, symbols) in sorted(tables.items()):
        tc = 0 if kind == "dc" else 1
        body = bytes([(tc << 4) | cls]) + bytes(bits) + bytes(
            s & 0xFF for s in symbols
        )
        out += seg(0xFFC4, body)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        cls = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (cls << 4) | cls])
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def encode_progressive_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    *,
    channels: int = 3,
    subsample: bool = False,
) -> bytes:
    """Encode as progressive JPEG (SOF2) with successive approximation.

    Scan script (valid per T.81 Annex G, chosen to exercise every decoder
    path): interleaved DC first scan at Al=1 → DC refinement (raw bits) →
    per-component AC spectral scans over two bands (1–5, 6–63) at Al=1 →
    per-component AC refinement scans for the same bands at Al=0. Each
    Huffman-coded scan builds and emits its own DHT just before its SOS,
    which also exercises the decoder's per-scan table snapshots.

    Same quantized coefficients as ``encode_jpeg`` — a progressive stream
    must decode to EXACTLY the pixels of its baseline twin, which is what
    the round-trip test asserts.
    """
    comp_coefs, samp, qids, ncomp, mcux, mcuy, _hmax, _vmax = _quantize_pixels(
        width, height, pixels, channels, subsample
    )

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for qid, q in ([(0, _Q_LUMA), (1, _Q_CHROMA)] if ncomp == 3 else [(0, _Q_LUMA)]):
        out += seg(0xFFDB, bytes([qid]) + bytes(int(q[p][c]) for p, c in _ZZ))
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, qids[ci]])
    out += seg(0xFFC2, sof)

    def nblocks(ci: int) -> tuple[int, int]:
        hi, vi = samp[ci]
        hmax = max(h_ for h_, _ in samp)
        vmax = max(v_ for _, v_ in samp)
        cw = -(-(width * hi) // hmax)
        ch = -(-(height * vi) // vmax)
        return (-(-ch // 8), -(-cw // 8))

    def emit_scan(scomp_ids, ss, se, ah, al, symbols, table_class):
        """symbols: list of (huff_sym or None, raw_bits, raw_len); sym None
        = raw bits only (DC refinement). Emits DHT (if coded) + SOS."""
        coded = [s for s, _, _ in symbols if s is not None]
        if coded:
            freqs: dict[int, int] = {}
            for s in coded:
                freqs[s] = freqs.get(s, 0) + 1
            bits, syms = _build_table(freqs)
            codes = _assign_codes(bits, syms)
            tc = table_class
            out.extend(
                seg(0xFFC4, bytes([(tc << 4) | 0]) + bytes(bits)
                    + bytes(s & 0xFF for s in syms))
            )
        w_ = _BitWriter()
        for s, raw, nb in symbols:
            if s is not None:
                c, ln = codes[s]
                w_.put(c, ln)
            if nb:
                w_.put(raw, nb)
        sos = bytes([len(scomp_ids)])
        for cid in scomp_ids:
            sos += bytes([cid, 0x00])  # both table ids 0
        sos += bytes([ss, se, (ah << 4) | al])
        out.extend(seg(0xFFDA, sos))
        out.extend(w_.flush())

    al_dc, al_ac = 1, 1

    # --- scan 1: interleaved DC first pass (Al=1) ---
    symbols: list[tuple[int | None, int, int]] = []
    pred = [0] * ncomp
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci in range(ncomp):
            hi, vi = samp[ci]
            for v in range(vi):
                for hb in range(hi):
                    dc = int(comp_coefs[ci][my * vi + v, mx * hi + hb][0]) >> al_dc
                    diff = dc - pred[ci]
                    pred[ci] = dc
                    s = _category(diff)
                    raw = diff if diff >= 0 else diff + (1 << s) - 1
                    symbols.append((s, raw, s))
    emit_scan([ci + 1 for ci in range(ncomp)], 0, 0, 0, al_dc, symbols, 0)

    # --- scan 2: DC refinement (raw bit per block, no Huffman) ---
    symbols = []
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci in range(ncomp):
            hi, vi = samp[ci]
            for v in range(vi):
                for hb in range(hi):
                    dc = int(comp_coefs[ci][my * vi + v, mx * hi + hb][0])
                    symbols.append((None, dc & 1, 1))
    emit_scan([ci + 1 for ci in range(ncomp)], 0, 0, 1, 0, symbols, 0)

    bands = [(1, 5), (6, 63)]

    # --- AC first passes (per component, per band, Al=1) ---
    for ci in range(ncomp):
        by, bx = nblocks(ci)
        for ss, se in bands:
            symbols = []
            for u in range(by * bx):
                yb, xb = divmod(u, bx)
                blk = comp_coefs[ci][yb, xb]
                vals = [int(blk[k]) for k in range(ss, se + 1)]
                tvals = [int(v / (1 << al_ac)) for v in vals]  # toward zero
                run = 0
                emitted = False
                last_nz = max(
                    (i for i, t in enumerate(tvals) if t), default=-1
                )
                for i, t in enumerate(tvals):
                    if i > last_nz:
                        break
                    if t == 0:
                        run += 1
                        continue
                    while run > 15:
                        symbols.append((0xF0, 0, 0))
                        run -= 16
                    s = _category(t)
                    raw = t if t >= 0 else t + (1 << s) - 1
                    symbols.append(((run << 4) | s, raw, s))
                    run = 0
                    emitted = True
                if last_nz < len(tvals) - 1 or not emitted:
                    symbols.append((0x00, 0, 0))  # EOB (run of 1)
            emit_scan([ci + 1], ss, se, 0, al_ac, symbols, 1)

    # --- AC refinement passes (Al=0): correction bits + new ±1 coefs ---
    for ci in range(ncomp):
        by, bx = nblocks(ci)
        for ss, se in bands:
            symbols = []
            for u in range(by * bx):
                yb, xb = divmod(u, bx)
                blk = comp_coefs[ci][yb, xb]
                # decoder-visible history after the Al=1 first pass
                hist = {
                    k: int(int(blk[k]) / 2) * 2 for k in range(ss, se + 1)
                }
                now = {k: int(blk[k]) for k in range(ss, se + 1)}
                k = ss
                while k <= se:
                    # find the next newly-nonzero coefficient
                    pos = None
                    zrun = 0
                    crossings: list[int] = []
                    j = k
                    while j <= se:
                        if hist[j] != 0:
                            crossings.append(j)
                        elif now[j] != 0:
                            pos = j
                            break
                        else:
                            zrun += 1
                        j += 1
                    if pos is None:
                        # no more new coefficients: EOB + trailing corrections
                        symbols.append((0x00, 0, 0))
                        for j2 in range(k, se + 1):
                            if hist[j2] != 0:
                                symbols.append((None, now[j2] & 1, 1))
                        k = se + 1
                        break
                    while zrun > 15:
                        # ZRL skips 16 zero-history positions; corrections
                        # for nonzero-history positions crossed on the way
                        symbols.append((0xF0, 0, 0))
                        skipped = 0
                        while k <= se and skipped < 16:
                            if hist[k] != 0:
                                symbols.append((None, now[k] & 1, 1))
                            else:
                                skipped += 1
                            k += 1
                        zrun -= 16
                        crossings = [c for c in crossings if c >= k]
                    sign = 1 if now[pos] > 0 else 0
                    symbols.append(((zrun << 4) | 1, 0, 0))
                    symbols.append((None, sign, 1))
                    for c in crossings:
                        symbols.append((None, now[c] & 1, 1))
                    k = pos + 1
            emit_scan([ci + 1], ss, se, 1, 0, symbols, 1)

    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _HuffDecoder:
    def __init__(self, bits: list[int], symbols: list[int]):
        self.map: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.map[(ln, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, r: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | r.bit()
            sym = self.map.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


def decode_jpeg(data: bytes) -> dict:
    """Decode a baseline JPEG → dict(width, height, channels, pixels)."""
    data = bytes(data)
    if not is_jpeg(data):
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    restart = 0
    frame = None  # (h, w, comps) comps: (cid, hi, vi, tq)
    progressive = False
    pscans: list[tuple] = []  # (scomps, Ss, Se, Ah, Al, huff snapshot, restart, entropy)
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            if marker == 0xD9:
                break
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0xF
                bpos += 1
                n = 64 * (2 if pq else 1)
                vals = (
                    struct.unpack(f">{64}H", body[bpos : bpos + n])
                    if pq
                    else body[bpos : bpos + 64]
                )
                t = np.zeros((8, 8))
                for (p, c), v in zip(_ZZ, vals):
                    t[p][c] = v
                qt[tq] = t
                bpos += n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 baseline, SOF2 progressive
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline and progressive JPEG are supported (SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xC4:  # DHT
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0xF
                bits = list(body[bpos + 1 : bpos + 17])
                n = sum(bits)
                symbols = list(body[bpos + 17 : bpos + 17 + n])
                huff[(tc, th)] = _HuffDecoder(bits, symbols)
                bpos += 17 + n
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scomps = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i : 3 + 2 * i]
                scomps.append((cs, tt >> 4, tt & 0xF))
            dpos = pos + seglen
            end = dpos
            while end < len(data) - 1:
                if data[end] == 0xFF and data[end + 1] not in (0x00,) and not (
                    0xD0 <= data[end + 1] <= 0xD7
                ):
                    break
                end += 1
            if not progressive:
                return _decode_scan(
                    frame, scomps, qt, huff, restart, data[dpos:end]
                )
            # progressive: scan header carries the spectral band and the
            # successive-approximation bit positions; Huffman tables may
            # be redefined between scans, so snapshot them per scan
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            pscans.append(
                (scomps, ss, se, ahal >> 4, ahal & 0xF, dict(huff),
                 restart, data[dpos:end])
            )
            pos = end
            continue
        pos += seglen
    if progressive and pscans:
        return _decode_progressive(frame, qt, pscans)
    raise ValueError("no SOS marker found")


def _decode_scan(frame, scomps, qt, huff, restart, entropy: bytes) -> dict:
    h, w, comps = frame
    by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors above 2 are not supported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    planes: dict[int, np.ndarray] = {}
    for cid, hi, vi, _tq in comps:
        planes[cid] = np.zeros((mcuy * vi * 8, mcux * hi * 8))

    # split at restart markers, unstuff each interval
    intervals: list[bytes] = []
    cur = bytearray()
    i = 0
    while i < len(entropy):
        b = entropy[i]
        if b == 0xFF and i + 1 < len(entropy):
            nxt = entropy[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                intervals.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(b)
        i += 1
    intervals.append(bytes(cur))

    zz_rows = [p for p, _ in _ZZ]
    zz_cols = [c for _, c in _ZZ]
    n_mcu = mcux * mcuy
    mcu_done = 0
    for interval in intervals:
        r = _BitReader(interval)
        pred = dict.fromkeys(by_id, 0)
        span = restart if restart else n_mcu - mcu_done
        for m in range(mcu_done, min(mcu_done + span, n_mcu)):
            my, mx = divmod(m, mcux)
            for cs, td, ta in scomps:
                hi, vi, tq = by_id[cs]
                for v in range(vi):
                    for hblk in range(hi):
                        zz = np.zeros(64)
                        s = huff[(0, td)].decode(r)
                        diff = _extend(r.take(s), s)
                        pred[cs] += diff
                        zz[0] = pred[cs]
                        k = 1
                        while k < 64:
                            sym = huff[(1, ta)].decode(r)
                            if sym == 0x00:
                                break
                            run, size = sym >> 4, sym & 0xF
                            if size == 0:
                                if run == 15:
                                    k += 16
                                    continue
                                break
                            k += run
                            if k > 63:
                                raise ValueError("AC coefficient index overflow")
                            zz[k] = _extend(r.take(size), size)
                            k += 1
                        blk = np.zeros((8, 8))
                        blk[zz_rows, zz_cols] = zz
                        spatial = _T.T @ (blk * qt[tq]) @ _T + 128.0
                        y0 = (my * vi + v) * 8
                        x0 = (mx * hi + hblk) * 8
                        planes[cs][y0 : y0 + 8, x0 : x0 + 8] = spatial
        mcu_done = min(mcu_done + span, n_mcu)

    return _planes_to_pixels(frame, planes, hmax, vmax)


def _planes_to_pixels(frame, planes, hmax, vmax) -> dict:
    """Upsample component planes to full resolution, crop, YCbCr→RGB."""
    h, w, comps = frame
    full = []
    for cid, hi, vi, _tq in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        px = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return {"width": w, "height": h, "channels": 1, "pixels": px.tobytes()}
    y, cb, cr = full
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.clip(np.round(np.stack([r_, g_, b_], axis=-1)), 0, 255).astype(np.uint8)
    return {"width": w, "height": h, "channels": 3, "pixels": rgb.tobytes()}


def _split_intervals(entropy: bytes) -> list[bytes]:
    """Split entropy data at restart markers, unstuffing 0xFF00."""
    intervals: list[bytes] = []
    cur = bytearray()
    i = 0
    while i < len(entropy):
        b = entropy[i]
        if b == 0xFF and i + 1 < len(entropy):
            nxt = entropy[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                intervals.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(b)
        i += 1
    intervals.append(bytes(cur))
    return intervals


def _decode_progressive(frame, qt, pscans) -> dict:
    """Progressive (SOF2) reconstruction: T.81 Annex G successive
    approximation. Coefficients accumulate across scans — interleaved DC
    scans over the MCU grid, non-interleaved AC scans over each
    component's own block raster — then one shared dequantize + IDCT +
    upsample pass."""
    h, w, comps = frame
    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors above 2 are not supported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    coefs: dict[int, np.ndarray] = {}
    nblocks: dict[int, tuple[int, int]] = {}
    for cid, hi, vi, _tq in comps:
        coefs[cid] = np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int64)
        cw = -(-(w * hi) // hmax)
        ch = -(-(h * vi) // vmax)
        nblocks[cid] = (-(-ch // 8), -(-cw // 8))

    for scomps, ss, se, ah, al, huff, restart, entropy in pscans:
        intervals = _split_intervals(entropy)
        p1 = 1 << al
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se = 0")
        if len(scomps) > 1 and ss != 0:
            raise ValueError("progressive AC scans are single-component")

        interleaved = len(scomps) > 1  # only DC scans may interleave
        if interleaved:
            n_units = mcux * mcuy  # unit = MCU
        else:
            cid0 = scomps[0][0]
            n_units = nblocks[cid0][0] * nblocks[cid0][1]  # unit = block

        done = 0
        eobrun = 0
        for interval in intervals:
            r = _BitReader(interval)
            pred = {cs: 0 for cs, _, _ in scomps}
            eobrun = 0
            span = restart if restart else n_units - done
            for u in range(done, min(done + span, n_units)):
                if ss == 0:
                    # DC: one value per block
                    blocks = []
                    if interleaved:
                        my, mx = divmod(u, mcux)
                        for cs, td, _ta in scomps:
                            hi, vi, _tq = by_id[cs]
                            for v in range(vi):
                                for hb in range(hi):
                                    blocks.append(
                                        (cs, td, my * vi + v, mx * hi + hb)
                                    )
                    else:
                        cs, td, _ta = scomps[0]
                        by, bx = divmod(u, nblocks[cs][1])
                        blocks.append((cs, td, by, bx))
                    for cs, td, by, bx in blocks:
                        blk = coefs[cs][by, bx]
                        if ah == 0:
                            s = huff[(0, td)].decode(r)
                            pred[cs] += _extend(r.take(s), s)
                            blk[0] = pred[cs] << al
                        elif r.bit():
                            blk[0] += p1
                    continue
                # AC scan: unit = one block of the single component
                cs, _td, ta = scomps[0]
                by, bx = divmod(u, nblocks[cs][1])
                blk = coefs[cs][by, bx]
                if ah == 0:
                    # first pass over this band
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        sym = huff[(1, ta)].decode(r)
                        run, size = sym >> 4, sym & 0xF
                        if size == 0:
                            if run < 15:
                                eobrun = (1 << run) - 1
                                if run:
                                    eobrun += r.take(run)
                                break
                            k += 16
                            continue
                        k += run
                        if k > se:
                            raise ValueError("AC index beyond spectral band")
                        blk[k] = _extend(r.take(size), size) * p1
                        k += 1
                    continue
                # refinement pass: correction bits + newly-nonzero coefs

                def _correct(idx: int) -> None:
                    if r.bit() and not (int(blk[idx]) & p1):
                        blk[idx] += p1 if blk[idx] > 0 else -p1

                if eobrun > 0:
                    eobrun -= 1
                    for k in range(ss, se + 1):
                        if blk[k] != 0:
                            _correct(k)
                    continue
                k = ss
                while k <= se:
                    sym = huff[(1, ta)].decode(r)
                    run, size = sym >> 4, sym & 0xF
                    if size == 0:
                        if run < 15:
                            eobrun = (1 << run) - 1
                            if run:
                                eobrun += r.take(run)
                            while k <= se:
                                if blk[k] != 0:
                                    _correct(k)
                                k += 1
                            break
                        val = 0  # ZRL: skip 16 zero-history positions
                    else:
                        if size != 1:
                            raise ValueError("bad AC refinement symbol")
                        val = p1 if r.bit() else -p1
                    while k <= se:
                        if blk[k] != 0:
                            _correct(k)
                        else:
                            if run == 0:
                                if val:
                                    blk[k] = val
                                k += 1
                                break
                            run -= 1
                        k += 1
            done = min(done + span, n_units)

    zz_rows = [p for p, _ in _ZZ]
    zz_cols = [c for _, c in _ZZ]
    planes: dict[int, np.ndarray] = {}
    for cid, hi, vi, tq in comps:
        arr = coefs[cid]
        by, bx = arr.shape[0], arr.shape[1]
        plane = np.zeros((by * 8, bx * 8))
        for y in range(by):
            for x in range(bx):
                blk = np.zeros((8, 8))
                blk[zz_rows, zz_cols] = arr[y, x]
                plane[y * 8 : y * 8 + 8, x * 8 : x * 8 + 8] = (
                    _T.T @ (blk * qt[tq]) @ _T + 128.0
                )
        planes[cid] = plane
    return _planes_to_pixels(frame, planes, hmax, vmax)


# ---------------------------------------------------------------------------
# synthetic test payloads
# ---------------------------------------------------------------------------


def synthetic_jpeg_pixels(media_id: int) -> tuple[int, int, bytes]:
    """Deterministic smooth RGB buffer (width, height, raw bytes).

    Smooth gradients (unlike png.synthetic_pixels' mod-256 sawtooths)
    so the lossy round-trip stays visually faithful — the PSNR test
    quantifies it."""
    width = 16 + (media_id % 5) * 8
    height = 16 + (media_id % 3) * 8
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)
    r = 128 + 100 * np.sin(xx / width * np.pi + media_id)
    g = 128 + 100 * np.cos(yy / height * np.pi + media_id * 0.7)
    b = 128 + 80 * np.sin((xx + yy) / (width + height) * 2 * np.pi)
    rgb = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
    return width, height, rgb.tobytes()


def synthetic_jpeg(media_id: int) -> tuple[int, int, bytes]:
    """Deterministic RGB test image: (width, height, jpeg_bytes)."""
    width, height, px = synthetic_jpeg_pixels(media_id)
    return width, height, encode_jpeg(width, height, px)


def synthetic_jpeg_payload(media_id: int) -> tuple[int, int, bytes]:
    """Deterministic encoded payload cycling through SIX encoder
    variants — 4:4:4 / 4:2:0 / restart-marker baseline streams plus
    progressive (SOF2) 4:4:4 and 4:2:0 — the single source of truth for
    both the distributed media table and its decode oracle."""
    w, h, px = synthetic_jpeg_pixels(media_id)
    variant = media_id % 6
    if variant == 4:
        return w, h, encode_progressive_jpeg(w, h, px)
    if variant == 5:
        return w, h, encode_progressive_jpeg(w, h, px, subsample=True)
    kw = [
        {},
        {"subsample": True},
        {"restart_interval": 2},
        {"subsample": True, "restart_interval": 1},
    ][variant]
    return w, h, encode_jpeg(w, h, px, **kw)
