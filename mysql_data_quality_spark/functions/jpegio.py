"""Pure-numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1, the
public spec): the dominant real crawl image format, completing the
in-repo codec family (PNG/GIF/BMP/PPM in ``imageio.py``).

Scope — baseline sequential DCT (SOF0), 8-bit, the shapes web JPEGs
actually use:

  * decoder: 1- or 3-component scans, sampling factors 1 or 2 per axis
    (4:4:4, 4:2:2, 4:2:0, grayscale), multiple DQT/DHT segments,
    restart intervals (DRI / RSTn reset the DC predictors), APPn/COM
    skipped, byte-stuffing (FF 00) handled; progressive (SOF2) and
    arithmetic coding are rejected with a clear error.
  * encoder: the test/round-trip twin — 4:4:4 or 4:2:0, SELF-DESCRIBING
    tables (quant tables are a documented ramp; Huffman tables are
    built canonically from the actual symbol frequencies of the image,
    two-pass), so no spec-appendix constants are baked in: the decoder
    reads whatever DQT/DHT declare, exactly as with foreign files.

Numerics: the DCT is the orthonormal 8x8 transform as two matrix
multiplies (``A @ x @ A.T``); all blocks of a component are IDCT'd in
one batched einsum.  JPEG is lossy — round-trip tests assert PSNR
bounds, while the transform itself is unit-tested against the closed
form (perfect reconstruction to float tolerance).

Entropy decode is a per-symbol loop over a 16-bit lookup table (one
table build per DHT: peek 16 bits -> (symbol, length)) — bounded by
thumbnail sizes in the multimodal stage, never a corpus-scale path.
"""

from __future__ import annotations

import struct

import numpy as np

from mysql_data_quality_spark.functions.imageio import ImageFormatError

# ---------------------------------------------------------------------------
# shared tables/transforms
# ---------------------------------------------------------------------------
_A = np.zeros((8, 8), dtype=np.float64)
for _k in range(8):
    _c = np.sqrt(1.0 / 8) if _k == 0 else 0.5
    for _n in range(8):
        _A[_k, _n] = _c * np.cos((2 * _n + 1) * _k * np.pi / 16)

ZIGZAG = []  # (row, col) in zigzag order
for _s in range(15):
    rng = range(_s, -1, -1) if _s % 2 == 0 else range(0, _s + 1)
    for _i in rng:
        _j = _s - _i
        if _i < 8 and _j < 8:
            ZIGZAG.append((_i, _j))
_ZR = np.array([p[0] for p in ZIGZAG])
_ZC = np.array([p[1] for p in ZIGZAG])


def dct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


def idct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


def _quant_table(q: int) -> np.ndarray:
    """Documented ramp table: coarser for higher frequencies, scaled by
    ``q`` (1 = near lossless, bigger = smaller/lossier).  Any table is
    spec-valid — it ships in DQT."""
    u, v = np.mgrid[0:8, 0:8]
    return np.clip(1 + (1 + u + v) * q, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# canonical Huffman (encode side: built from real frequencies)
# ---------------------------------------------------------------------------
def _huffman_lengths(freqs: dict, max_len: int = 16) -> dict:
    """Symbol -> code length, canonical Huffman with a 16-bit cap
    (JPEG limit).  Deterministic: ties break on symbol value.

    A reserved dummy symbol (T.81 K.2's V=256 trick, here -1 so it pops
    FIRST among minimum-frequency leaves and lands at maximum depth) is
    added before tree building and dropped after: the canonical
    assignment then leaves exactly one deepest leaf unused, so no real
    symbol ever receives the all-1-bits codeword of maximum length —
    Annex C reserves that code because it aliases the 1-bits padding
    before markers, and strict foreign decoders can misparse streams
    that use it (r6 ADVICE)."""
    import heapq

    if not freqs:
        return {}
    _DUMMY = -1
    assert _DUMMY not in freqs
    freqs = {**freqs, _DUMMY: 1}
    heap = [(f, sym, (sym,)) for sym, f in sorted(freqs.items())]
    heapq.heapify(heap)
    depth: dict = {s: 0 for s in freqs}
    while len(heap) > 1:
        f1, s1, g1 = heapq.heappop(heap)
        f2, s2, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, min(s1, s2), g1 + g2))
    # cap at max_len: push overlong symbols up (rare at 16; simple and
    # valid — lengths just need Kraft <= 1, enforced below)
    while max(depth.values()) > max_len:
        over = [s for s, d in depth.items() if d > max_len]
        for s in over:
            depth[s] = max_len
        # rebalance: shorten nothing, lengthen the shallowest until
        # Kraft holds
        while sum(2.0 ** -d for d in depth.values()) > 1.0:
            s = min(
                (s for s, d in depth.items() if d < max_len),
                key=lambda s: (depth[s], s),
            )
            depth[s] += 1
    # drop the reserved dummy: Kraft becomes < 1 by 2^-depth(dummy) and
    # the canonical packing leaves the trailing (all-ones) code unused
    del depth[_DUMMY]
    return depth


def _canonical_codes(lengths: dict) -> dict:
    """Symbol -> (code, length), canonical order (length, then symbol)."""
    code = 0
    out = {}
    last_len = 0
    for sym in sorted(lengths, key=lambda s: (lengths[s], s)):
        ln = lengths[sym]
        code <<= ln - last_len
        out[sym] = (code, ln)
        code += 1
        last_len = ln
    return out


def _dht_payload(tc: int, th: int, lengths: dict) -> bytes:
    bits = [0] * 17
    for ln in lengths.values():
        bits[ln] += 1
    vals = sorted(lengths, key=lambda s: (lengths[s], s))
    return bytes([tc << 4 | th]) + bytes(bits[1:]) + bytes(vals)


# ---------------------------------------------------------------------------
# bit IO
# ---------------------------------------------------------------------------
class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-padding per spec
        return bytes(self.buf)


class _BitReader:
    """Reads from an already de-stuffed byte segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self, need: int) -> None:
        while self.n < need:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.n += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def skip(self, length: int) -> None:
        self._fill(length)
        self.n -= length

    def read(self, length: int) -> int:
        if length == 0:
            return 0
        self._fill(length)
        v = (self.acc >> (self.n - length)) & ((1 << length) - 1)
        self.n -= length
        return v


def _decode_lut(bits: list, vals: list):
    """DHT (BITS, HUFFVAL) -> 65536-entry (symbol, length) lookup."""
    sym = np.full(1 << 16, -1, dtype=np.int32)
    ln = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return sym, ln


def _extend(v: int, size: int) -> int:
    """JPEG magnitude decode: size-bit value -> signed coefficient."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _magnitude_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------
def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane -> (nby, nbx, 8, 8) with edge replication."""
    h, w = plane.shape
    nby, nbx = -(-h // 8), -(-w // 8)
    padded = np.pad(
        plane, ((0, nby * 8 - h), (0, nbx * 8 - w)), mode="edge"
    )
    return padded.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3), nby, nbx


def _encode_component_symbols(qblocks, order):
    """Quantized zigzag blocks (n, 64) + emit order -> symbol stream
    [(kind, table_kind, symbol, extra_bits_value, extra_bits_len)]."""
    out = []
    pred = 0
    for bi in order:
        zz = qblocks[bi]
        dc = int(zz[0])
        diff = dc - pred
        pred = dc
        size = _category(diff)
        out.append(("dc", size, _magnitude_bits(diff, size), size))
        run = 0
        last_nz = 0
        for i in range(1, 64):
            if zz[i]:
                last_nz = i
        for i in range(1, last_nz + 1):
            v = int(zz[i])
            if v == 0:
                run += 1
                if run == 16:
                    out.append(("ac", 0xF0, 0, 0))  # ZRL
                    run = 0
                continue
            size = _category(v)
            out.append(("ac", run << 4 | size, _magnitude_bits(v, size), size))
            run = 0
        if last_nz < 63:
            out.append(("ac", 0x00, 0, 0))  # EOB
    return out


def encode_jpeg(
    arr: np.ndarray, quality: int = 2, subsample: bool = False
) -> bytes:
    """uint8 HxWx3 -> baseline JPEG bytes (4:4:4, or 4:2:0 with
    ``subsample=True``).  ``quality`` scales the ramp quant table
    (1 = near lossless)."""
    a = np.asarray(arr, dtype=np.float64)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ImageFormatError(f"expected HxWx3 or HxW array, got {a.shape}")
    h, w = a.shape[:2]
    qt_l = _quant_table(quality)
    if gray:
        planes = [(a, qt_l, 0, (1, 1))]
    else:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        qt_c = _quant_table(quality * 2)
        sampling = (2, 2) if subsample else (1, 1)
        planes = [(y, qt_l, 0, sampling)]
        for c in (cb, cr):
            if subsample:
                hh, ww = (h + 1) // 2 * 2, (w + 1) // 2 * 2
                cpad = np.pad(c, ((0, hh - h), (0, ww - w)), mode="edge")
                c = cpad.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
            planes.append((c, qt_c, 1, (1, 1)))

    # per-component quantized zigzag blocks + MCU-interleaved emit order
    comps = []
    H = max(p[3][0] for p in planes)
    V = max(p[3][1] for p in planes)
    mcux = -(-w // (8 * H))
    mcuy = -(-h // (8 * V))
    for plane, qt, tq, (sh, sv) in planes:
        # pad the plane so the block grid covers whole MCUs
        need_h, need_w = mcuy * sv * 8, mcux * sh * 8
        ph, pw = plane.shape
        plane = np.pad(
            plane, ((0, need_h - ph), (0, need_w - pw)), mode="edge"
        )
        blocks, nby, nbx = _blocks_of(plane)
        coeffs = np.einsum(
            "km,yxmn,ln->yxkl", _A, blocks - 128.0, _A, optimize=True
        )
        qz = np.round(coeffs / qt).astype(np.int64)
        flat = qz.reshape(nby * nbx, 8, 8)[:, _ZR, _ZC]
        comps.append(
            {"flat": flat, "nbx": nbx, "tq": tq, "sh": sh, "sv": sv}
        )

    # symbol streams in scan order (needed for Huffman freqs AND emit)
    streams = []  # per component: list of symbol tuples
    for ci, comp in enumerate(comps):
        sh, sv, nbx = comp["sh"], comp["sv"], comp["nbx"]
        order = [
            (my * sv + by) * nbx + (mx * sh + bx)
            for my in range(mcuy)
            for mx in range(mcux)
            for by in range(sv)
            for bx in range(sh)
        ]
        streams.append(_encode_component_symbols(comp["flat"], order))

    # Huffman tables from the actual frequencies (lum = comp 0, chrom = rest)
    tables = {}
    for th, idxs in ((0, [0]), (1, [1, 2])):
        for kind in ("dc", "ac"):
            freqs: dict = {}
            for ci in idxs:
                if ci >= len(streams):
                    continue
                for k, symbol, _vbits, _vlen in streams[ci]:
                    if k == kind:
                        freqs[symbol] = freqs.get(symbol, 0) + 1
            if freqs:
                lengths = _huffman_lengths(freqs)
                tables[(kind, th)] = (
                    lengths, _canonical_codes(lengths)
                )

    # interleave the per-component streams back into MCU order
    writer = _BitWriter()
    iters = [iter(s) for s in streams]
    blocks_per_mcu = [c["sh"] * c["sv"] for c in comps]

    def emit_block(ci):
        th = comps[ci]["tq"]
        # one DC symbol, then AC symbols until EOB/last
        kind, symbol, vbits, vlen = next(iters[ci])
        code, ln = tables[("dc", th)][1][symbol]
        writer.write(code, ln)
        if vlen:
            writer.write(vbits, vlen)
        # AC until this block's terminator consumed
        coeffs_done = 0
        while coeffs_done < 63:
            kind, symbol, vbits, vlen = next(iters[ci])
            code, ln = tables[("ac", th)][1][symbol]
            writer.write(code, ln)
            if vlen:
                writer.write(vbits, vlen)
            if symbol == 0x00:  # EOB
                break
            if symbol == 0xF0:  # ZRL
                coeffs_done += 16
            else:
                coeffs_done += (symbol >> 4) + 1

    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(len(comps)):
                for _ in range(blocks_per_mcu[ci]):
                    emit_block(ci)
    entropy = writer.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    qtables = [(0, qt_l)] if gray else [(0, qt_l), (1, qt_c)]
    for tq, qtab in qtables:
        zz = qtab[_ZR, _ZC].astype(np.uint8)
        out += seg(0xDB, bytes([tq]) + zz.tobytes())
    ncomp = len(comps)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci, comp in enumerate(comps):
        sof += bytes([ci + 1, comp["sh"] << 4 | comp["sv"], comp["tq"]])
    out += seg(0xC0, sof)
    for (kind, th), (lengths, _codes) in sorted(tables.items()):
        out += seg(
            0xC4, _dht_payload(0 if kind == "dc" else 1, th, lengths)
        )
    sos = bytes([ncomp])
    for ci, comp in enumerate(comps):
        th = comp["tq"]
        sos += bytes([ci + 1, th << 4 | th])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------
def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> uint8 HxWx3 (grayscale expanded).

    Crawl payloads are hostile: any malformed-but-magic-valid structure
    (scan referencing an absent component id, missing DQT/DHT table ids,
    truncated tables) must surface as the TYPED :class:`ImageFormatError`
    — ``multimodal.real_decode`` only catches that to fall through to its
    unavailable path, so a bare ``StopIteration``/``KeyError``/
    ``IndexError`` here would kill a whole Spark stage on one corrupt
    image (r6 ADVICE)."""
    try:
        return _decode_jpeg_impl(payload)
    except ImageFormatError:
        raise
    except Exception as exc:  # hostile-input boundary: typed error out
        raise ImageFormatError(f"malformed JPEG: {exc!r}") from exc


def _decode_jpeg_impl(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ImageFormatError("not a JPEG payload")
    pos = 2
    qt = {}
    huff = {}
    frame = None
    restart_interval = 0
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ImageFormatError(
                f"JPEG marker expected at {pos}, got {payload[pos]:#x}"
            )
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1  # fill bytes: any number of FFs may pad a marker
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            break
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + ln]
        if len(body) != ln - 2:
            raise ImageFormatError(
                f"truncated JPEG segment {marker:#x}"
            )
        if marker == 0xDB:  # DQT (possibly several tables)
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0xF
                bp += 1
                if pq != 0:
                    raise ImageFormatError("16-bit quant tables unsupported")
                tbl = np.zeros((8, 8), dtype=np.int64)
                tbl[_ZR, _ZC] = np.frombuffer(
                    body[bp : bp + 64], dtype=np.uint8
                ).astype(np.int64)
                qt[tq] = tbl
                bp += 64
        elif marker == 0xC4:  # DHT (possibly several tables)
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 0xF
                bits = list(body[bp + 1 : bp + 17])
                cnt = sum(bits)
                vals = list(body[bp + 17 : bp + 17 + cnt])
                huff[(tc, th)] = _decode_lut(bits, vals)
                bp += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:  # baseline SOF
            prec = body[0]
            if prec != 8:
                raise ImageFormatError(f"unsupported precision {prec}")
            fh, fw = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            comps = []
            for i in range(nc):
                cid, hv, tqi = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "sh": hv >> 4, "sv": hv & 0xF, "tq": tqi}
                )
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ImageFormatError(
                f"non-baseline JPEG (SOF {marker:#x}) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS: entropy data follows
            if frame is None:
                raise ImageFormatError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i : 3 + 2 * i]
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cs), None
                )
                if comp is None:
                    raise ImageFormatError(
                        f"JPEG scan references component id {cs} "
                        "absent from SOF"
                    )
                scan.append((comp, tt >> 4, tt & 0xF))
            data_start = pos + 2 + ln
            return _decode_scan(
                payload, data_start, frame, scan, qt, huff,
                restart_interval,
            )
        # APPn / COM / others: skip
        pos += 2 + ln
    raise ImageFormatError("JPEG stream ended before SOS")


def _split_entropy(payload: bytes, start: int):
    """Entropy segment -> de-stuffed intervals split at RST markers."""
    segments = []
    cur = bytearray()
    pos = start
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = payload[pos + 1] if pos + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # EOI or next marker: scan over
            break
    segments.append(bytes(cur))
    return segments


def _decode_scan(payload, start, frame, scan, qt, huff, restart_interval):
    h, w = frame["h"], frame["w"]
    H = max(c["sh"] for c, _, _ in scan)
    V = max(c["sv"] for c, _, _ in scan)
    mcux, mcuy = -(-w // (8 * H)), -(-h // (8 * V))
    segments = _split_entropy(payload, start)
    seg_i = 0
    reader = _BitReader(segments[0])
    preds = [0] * len(scan)
    # coefficient storage per scan component
    store = []
    for comp, _, _ in scan:
        nbx, nby = mcux * comp["sh"], mcuy * comp["sv"]
        store.append(np.zeros((nby * nbx, 8, 8), dtype=np.float64))

    def read_symbol(lut):
        sym, ln = lut
        peek = reader.peek16()
        s = int(sym[peek])
        if s < 0:
            raise ImageFormatError("invalid JPEG Huffman code")
        reader.skip(int(ln[peek]))
        return s

    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                seg_i += 1
                if seg_i >= len(segments):
                    raise ImageFormatError("JPEG restart segment missing")
                reader = _BitReader(segments[seg_i])
                preds = [0] * len(scan)
            for si, (comp, td, ta) in enumerate(scan):
                sh, sv = comp["sh"], comp["sv"]
                nbx = mcux * sh
                dlut = huff.get((0, td))
                alut = huff.get((1, ta))
                if dlut is None or alut is None:
                    raise ImageFormatError("JPEG scan references missing DHT")
                for by in range(sv):
                    for bx in range(sh):
                        zz = np.zeros(64, dtype=np.float64)
                        s = read_symbol(dlut)
                        diff = _extend(reader.read(s), s)
                        preds[si] += diff
                        zz[0] = preds[si]
                        k = 1
                        while k < 64:
                            rs = read_symbol(alut)
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ImageFormatError(
                                    "JPEG AC run past block end"
                                )
                            size = rs & 0xF
                            zz[k] = _extend(reader.read(size), size)
                            k += 1
                        bi = (my * sv + by) * nbx + (mx * sh + bx)
                        blk = np.zeros((8, 8), dtype=np.float64)
                        blk[_ZR, _ZC] = zz
                        store[si][bi] = blk
            mcu_count += 1

    # dequantize + batched IDCT + assemble planes
    planes = []
    for si, (comp, _, _) in enumerate(scan):
        sh, sv = comp["sh"], comp["sv"]
        nbx, nby = mcux * sh, mcuy * sv
        tbl = qt.get(comp["tq"])
        if tbl is None:
            raise ImageFormatError("JPEG scan references missing DQT")
        coeffs = store[si] * tbl
        # x = A.T @ X @ A, batched: x[m,n] = sum_{k,l} A[k,m] X[k,l] A[l,n]
        spat = np.einsum(
            "km,bkl,ln->bmn", _A, coeffs, _A, optimize=True
        ) + 128.0
        plane = (
            spat.reshape(nby, nbx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nby * 8, nbx * 8)
        )
        # upsample to full MCU-grid resolution, then crop
        ry, rx = V // sv, H // sh
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        yp = np.clip(planes[0], 0, 255).astype(np.uint8)
        return np.repeat(yp[:, :, None], 3, axis=2)
    yp, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = yp + 1.402 * cr
    g = yp - 0.344136 * cb - 0.714136 * cr
    b = yp + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)
