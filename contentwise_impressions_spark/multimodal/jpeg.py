"""Pure-numpy baseline-sequential JPEG codec (ITU-T T.81).

Extends the real-decode surface (`binary_ops._REAL_DECODERS`) to the one
compressed image format class the container previously could not decode:
baseline DCT JPEG — SOI/APP/DQT/SOF0/DHT/DRI/SOS/RSTn/EOI marker walk,
canonical-Huffman entropy decode (tables taken from the stream's DHT
segments, so any compliant encoder's output parses), dequantize +
dezigzag, exact float 8x8 IDCT, generic h/v sampling-factor upsample
(4:4:4, 4:2:2, 4:2:0), YCbCr→RGB, crop to the SOF dimensions.

`encode_jpeg` is the fixture twin (like `encode_wav`): it emits valid
baseline JPEG with SELF-DEFINED flat-length Huffman tables declared in
DHT (fixed 4-bit DC / 8-bit AC codes — legal, merely suboptimal, and
chosen so no table from the spec's informative annex needs reproducing)
and a flat quantization table, so the roundtrip error is bounded by the
quant step through the IDCT.

Scale note: decode runs row-independent inside the same mapInPandas
kernel as the other codecs — no shuffle, payload bytes never leave their
row; the per-row Python cost is the irreducible entropy-decode loop and
is Arrow-batched like every other decode stage.
"""

from __future__ import annotations

import sys

import numpy as np

try:  # by-value pickling: executors need no PYTHONPATH (see slim.py note)
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

#: zig-zag scan order: index i of the scan holds flat position ZIGZAG[i]
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: orthonormal 8-point DCT-II basis: row k = c_k * cos((2n+1)kπ/16)
_C = np.array(
    [
        [
            (np.sqrt(1.0 / 8.0) if k == 0 else np.sqrt(2.0 / 8.0))
            * np.cos((2 * n + 1) * k * np.pi / 16.0)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


def _category(v: int) -> int:
    """JPEG magnitude category: smallest s with |v| < 2**s."""
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------
# fixture Huffman tables: every DC category gets a 4-bit code (12 symbols,
# codes 0..11 — the all-ones code 0xF is unused, as required), every AC
# symbol an 8-bit code (162 symbols, codes 0..161).  DHT declares them, so
# any compliant decoder reproduces the same canonical assignment.
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_CODE = {sym: (i, 4) for i, sym in enumerate(_DC_SYMBOLS)}
_AC_CODE = {sym: (i, 8) for i, sym in enumerate(_AC_SYMBOLS)}

#: flat quantization table (step 2 everywhere): max |quant error| per
#: coefficient is 1, so the roundtrip pixel error stays single-digit
_QTABLE = np.full(64, 2, dtype=np.int64)


def _emit_block(
    vals: list[int], lens: list[int], zz: list[int], pred: int
) -> int:
    """Huffman-encode one already-quantized zigzag block as (value, length)
    pairs appended to `vals`/`lens` (packed in one vectorized pass by
    `_pack_bits`); returns the new DC predictor."""
    dc = zz[0]
    diff = dc - pred
    cat = _category(diff)
    code, ln = _DC_CODE[cat]
    vals.append(code)
    lens.append(ln)
    if cat:
        vals.append(diff if diff >= 0 else diff + (1 << cat) - 1)
        lens.append(cat)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = zz[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _AC_CODE[0xF0]  # ZRL
            vals.append(code)
            lens.append(ln)
            run -= 16
        size = _category(v)
        code, ln = _AC_CODE[(run << 4) | size]
        vals.append(code)
        lens.append(ln)
        vals.append(v if v >= 0 else v + (1 << size) - 1)
        lens.append(size)
        run = 0
    if last_nz < 63:
        code, ln = _AC_CODE[0x00]  # EOB
        vals.append(code)
        lens.append(ln)
    return dc


def _pack_bits(vals: list[int], lens: list[int]) -> bytes:
    """(value, length) pairs → MSB-first entropy bytes: 1s-padded to a byte
    boundary and 0xFF-stuffed — ONE vectorized pass replaces the former
    per-symbol _BitWriter.write loop (was 38% of encode wall time)."""
    v = np.asarray(vals, dtype=np.int64)
    ln = np.asarray(lens, dtype=np.int64)
    v = v & ((np.int64(1) << ln) - 1)
    total = int(ln.sum())
    if total == 0:
        return b""
    ends = np.cumsum(ln)
    # bit position within each value, MSB first
    pos = np.arange(total, dtype=np.int64) - np.repeat(ends - ln, ln)
    shifts = np.repeat(ln, ln) - 1 - pos
    bits = ((np.repeat(v, ln) >> shifts) & 1).astype(np.uint8)
    pad = (-total) % 8
    if pad:  # pad with 1-bits per spec
        bits = np.concatenate([bits, np.ones(pad, np.uint8)])
    return np.packbits(bits).tobytes().replace(b"\xff", b"\xff\x00")


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dht(tc: int, th: int, bits: list[int], symbols: list[int]) -> bytes:
    return _seg(
        0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(symbols)
    )


def encode_jpeg(
    img: np.ndarray,
    subsample: bool = False,
    restart_interval: int = 0,
    separate_scans: bool = False,
) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 → baseline JPEG bytes
    (flat quant step 2, self-defined DHT tables).

    `subsample=True` emits 4:2:0 (Y at 2x2, averaged-2x2 chroma);
    `restart_interval=n` emits a DRI segment and RSTn markers every n
    MCUs; `separate_scans=True` emits one NON-interleaved SOS per
    component (legal baseline, T.81 B.2.3) — all three exist to exercise
    the decoder's generic sampling-factor / restart / multi-scan paths
    with realistic streams.  `separate_scans` ignores restart_interval.
    """
    a = np.asarray(img, dtype=np.float64)
    gray = a.ndim == 2
    h, wd = a.shape[:2]
    if gray:
        planes = [a]
        factors = [(1, 1)]
    else:
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        factors = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    n_comp = len(planes)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = (wd + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    prepped = []
    for (fh, fv), plane in zip(factors, planes):
        sx, sy = hmax // fh, vmax // fv
        if sx > 1 or sy > 1:  # average-pool chroma down to its grid
            eh = (plane.shape[0] + sy - 1) // sy * sy
            ew = (plane.shape[1] + sx - 1) // sx * sx
            p = np.pad(
                plane,
                ((0, eh - plane.shape[0]), (0, ew - plane.shape[1])),
                mode="edge",
            )
            plane = p.reshape(eh // sy, sy, ew // sx, sx).mean(axis=(1, 3))
        th, tw = mcus_y * fv * 8, mcus_x * fh * 8
        prepped.append(
            np.pad(
                plane,
                ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
                mode="edge",
            )
        )

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(int(x) for x in _QTABLE[ZIGZAG]))
    sof = bytes([8]) + h.to_bytes(2, "big") + wd.to_bytes(2, "big")
    sof += bytes([n_comp])
    for cid in range(1, n_comp + 1):
        fh, fv = factors[cid - 1]
        sof += bytes([cid, (fh << 4) | fv, 0])  # qtable 0 for every comp
    out += _seg(0xC0, sof)
    out += _dht(0, 0, _DC_BITS, _DC_SYMBOLS)
    out += _dht(1, 0, _AC_BITS, _AC_SYMBOLS)
    if restart_interval and not separate_scans:
        # separate_scans writes no RSTn markers, so emitting DRI would
        # make the stream self-inconsistent (decoder would hunt for
        # restarts that never come) — the docstring's "ignores
        # restart_interval" must hold for the DRI segment too
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    if not separate_scans:
        sos = bytes([n_comp])
        for cid in range(1, n_comp + 1):
            sos += bytes([cid, 0x00])  # DC table 0, AC table 0
        sos += bytes([0, 63, 0])  # full spectral selection, no approx
        out += _seg(0xDA, sos)

    # batch DCT + quantize per plane: ONE einsum over every 8x8 block,
    # zigzagged to int lists (the per-block _dct2 matmuls and np.round
    # calls were pure Python-call overhead on small images)
    qt8 = _QTABLE.reshape(8, 8).astype(np.float64)
    zz_planes = []
    for ci, plane in enumerate(prepped):
        br, bc = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = (
            plane.reshape(br, 8, bc, 8).transpose(0, 2, 1, 3) - 128.0
        )
        coef = np.einsum("ij,rcjk,kl->rcil", _C, blocks, _C.T)
        q = np.round(coef / qt8).astype(np.int64).reshape(br, bc, 64)
        zz_planes.append(q[:, :, ZIGZAG].tolist())

    if separate_scans:
        # one NON-interleaved scan per component: MCU = one block in the
        # component's raster order, DC predictor chain reset per scan
        for ci in range(n_comp):
            out += _seg(0xDA, bytes([1, ci + 1, 0x00, 0, 63, 0]))
            vals, lens = [], []
            pred = 0
            # only the component's OWN ceil(size/8) block grid is coded
            # non-interleaved (A.2.2) — not the padded MCU grid
            fh, fv = factors[ci]
            cw = (wd * fh + hmax - 1) // hmax
            chh = (h * fv + vmax - 1) // vmax
            zzp = zz_planes[ci]
            for row in zzp[: (chh + 7) // 8]:
                for zz in row[: (cw + 7) // 8]:
                    pred = _emit_block(vals, lens, zz, pred)
            out += _pack_bits(vals, lens)
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    vals: list[int] = []
    lens: list[int] = []
    preds = [0] * n_comp
    n_mcu, rst = 0, 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                # pack the finished restart segment (byte-aligned by spec)
                out += _pack_bits(vals, lens)
                out += bytes([0xFF, 0xD0 + rst])
                vals, lens = [], []
                rst = (rst + 1) % 8
                preds = [0] * n_comp
            for ci, zzp in enumerate(zz_planes):
                fh, fv = factors[ci]
                for by in range(fv):
                    for bx in range(fh):
                        preds[ci] = _emit_block(
                            vals,
                            lens,
                            zzp[my * fv + by][mx * fh + bx],
                            preds[ci],
                        )
            n_mcu += 1
    out += _pack_bits(vals, lens)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------
class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops cleanly at
    any non-stuffing marker (RSTn handled by the caller via `align`)."""

    def __init__(self, b: bytes, i: int) -> None:
        self.b = b
        self.i = i
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.b
        while self.n <= 24 and self.i < len(b):
            byte = b[self.i]
            if byte == 0xFF:
                nxt = b[self.i + 1] if self.i + 1 < len(b) else 0xD9
                if nxt != 0x00:
                    break  # RSTn (caller re-aligns) or EOI/next segment
                self.i += 2  # stuffed 0xFF00 → one literal 0xFF data byte
            else:
                self.i += 1
            self.acc = (self.acc << 8) | byte
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        while self.n < k:
            before = self.n
            self._fill()
            if self.n == before:  # ran off the segment: pad with 1s
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def peek16(self) -> int:
        """Next 16 bits WITHOUT consuming (end-of-segment padded with 1s)."""
        while self.n < 16:
            before = self.n
            self._fill()
            if self.n == before:
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def skip(self, k: int) -> None:
        self.n -= k
        self.acc &= (1 << self.n) - 1

    def restart(self) -> None:
        """Byte-align and consume one RSTn marker."""
        self.acc, self.n = 0, 0
        b = self.b
        while self.i + 1 < len(b):
            if b[self.i] == 0xFF and 0xD0 <= b[self.i + 1] <= 0xD7:
                self.i += 2
                return
            self.i += 1


class _HuffTable:
    """Canonical JPEG Huffman table from a DHT (bits, symbols) spec,
    compiled to a flat 2^16 prefix LUT: decode = one 16-bit peek + one
    list index + one skip (vs the former bit-at-a-time walk, which was
    77% of decode wall time).  Tables are memoized on the (bits, symbols)
    spec — typical corpora reuse a handful of tables across millions of
    images, so the 64K-entry build amortizes to zero."""

    def __init__(self, bits: list[int], symbols: list[int]) -> None:
        sym16 = [0] * 65536
        len16 = [0] * 65536
        code, k = 0, 0
        for ln in range(1, 17):
            shift = 16 - ln
            for _ in range(bits[ln - 1]):
                base = code << shift
                span = 1 << shift
                sym16[base : base + span] = [symbols[k]] * span
                len16[base : base + span] = [ln] * span
                code += 1
                k += 1
            code <<= 1
        self.sym16 = sym16
        self.len16 = len16

    def decode(self, r: _BitReader) -> int:
        v = r.peek16()
        ln = self.len16[v]
        if ln == 0:
            raise ValueError("invalid JPEG: Huffman code longer than 16 bits")
        r.skip(ln)
        return self.sym16[v]


_HUFF_CACHE: dict[tuple, _HuffTable] = {}


def _huff_table(bits: list[int], symbols: list[int]) -> _HuffTable:
    key = (tuple(bits), tuple(symbols))
    tab = _HUFF_CACHE.get(key)
    if tab is None:
        if len(_HUFF_CACHE) > 256:  # bound memory on adversarial streams
            _HUFF_CACHE.clear()
        tab = _HUFF_CACHE[key] = _HuffTable(bits, symbols)
    return tab


def _extend(v: int, size: int) -> int:
    """Sign-extend a JPEG magnitude-category value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 image (h, w) grayscale or (h, w, 3) RGB.

    Handles multi-scan baseline streams (one SOS per component is legal
    baseline, T.81 B.2.3), non-interleaved single-component scans
    (MCU = one block in the component's own raster order, A.2.2), 0xFF
    fill bytes before markers (B.1.1.2), and length-less markers (TEM,
    stray RSTn) in the header walk."""
    b = bytes(buf)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file (missing SOI)")
    qtabs: dict[int, np.ndarray] = {}
    hufs: dict[tuple[int, int], _HuffTable] = {}
    comps: list[dict] = []
    planes: dict[int, np.ndarray] = {}  # comp id → full-grid pixel plane
    h = wd = 0
    restart_interval = 0
    i = 2
    while i + 2 <= len(b):
        if b[i] != 0xFF:
            raise ValueError(f"invalid JPEG: expected marker at byte {i}")
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte before a marker (B.1.1.2)
            i += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            # length-less markers: TEM, stray RSTn, re-emitted SOI
            i += 2
            continue
        if i + 4 > len(b):
            raise ValueError("truncated JPEG: marker without length")
        seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
        if i + 2 + seg_len > len(b):
            raise ValueError("truncated JPEG: segment overruns buffer")
        body = b[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0xF
                if pq:  # 16-bit entries
                    tab = np.frombuffer(
                        body[j + 1 : j + 129], ">u2"
                    ).astype(np.int64)
                    j += 129
                else:
                    tab = np.frombuffer(
                        body[j + 1 : j + 65], np.uint8
                    ).astype(np.int64)
                    j += 65
                out = np.zeros(64, dtype=np.int64)
                out[ZIGZAG] = tab
                qtabs[tq] = out
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                n_sym = sum(bits)
                syms = list(body[j + 17 : j + 17 + n_sym])
                hufs[(tc, th)] = _huff_table(bits, syms)
                j += 17 + n_sym
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            h = int.from_bytes(body[1:3], "big")
            wd = int.from_bytes(body[3:5], "big")
            n_comp = body[5]
            comps = []
            for c in range(n_comp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            # progressive / hierarchical / arithmetic coding processes
            raise ValueError(
                f"unsupported JPEG coding process (SOF{marker - 0xC0})"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if not comps:
                raise ValueError("invalid JPEG: SOS before SOF")
            n_scan = body[0]
            scan_ids: list[int] = []
            scan: dict[int, tuple[int, int]] = {}
            for c in range(n_scan):
                cid, tables = body[1 + 2 * c : 3 + 2 * c]
                scan_ids.append(cid)
                scan[cid] = (tables >> 4, tables & 0xF)
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = (wd + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                if c["id"] in scan and c["id"] not in planes:
                    planes[c["id"]] = np.zeros(
                        (mcus_y * c["v"] * 8, mcus_x * c["h"] * 8),
                        np.float64,
                    )
            i = _decode_scan(
                b, i + 2 + seg_len, h, wd, comps, scan_ids, scan, qtabs,
                hufs, restart_interval, planes,
            )
            continue
        i += 2 + seg_len
    if not planes:
        raise ValueError("invalid JPEG: no SOS segment")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for c in comps:
        if c["id"] not in planes:
            raise ValueError(
                f"invalid JPEG: component {c['id']} never scanned"
            )
        p = np.repeat(
            np.repeat(planes[c["id"]], vmax // c["v"], axis=0),
            hmax // c["h"],
            axis=1,
        )
        full.append(p[:h, :wd])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(r: _BitReader, dc_t, ac_t, pred: int) -> list[int]:
    """Entropy-decode one block; returns its 64 scan-order coefficients
    with the DC already predictor-resolved (zz[0] = new predictor)."""
    zz = [0] * 64
    cat = dc_t.decode(r)
    diff = _extend(r.bits(cat), cat) if cat else 0
    zz[0] = pred + diff
    k = 1
    while k < 64:
        sym = ac_t.decode(r)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        k += sym >> 4
        size = sym & 0xF
        if k > 63:
            raise ValueError("invalid JPEG: AC index past 63")
        zz[k] = _extend(r.bits(size), size)
        k += 1
    return zz


def _decode_scan(
    b: bytes,
    start: int,
    h: int,
    wd: int,
    comps: list[dict],
    scan_ids: list[int],
    scan: dict,
    qtabs: dict,
    hufs: dict,
    restart_interval: int,
    planes: dict[int, np.ndarray],
) -> int:
    """Decode one SOS's entropy data into `planes`; returns the byte
    index of the next marker after the scan (multi-scan support)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    sc = [c for cid in scan_ids for c in comps if c["id"] == cid]
    if len(sc) != len(scan_ids):
        raise ValueError("invalid JPEG: scan references unknown component")
    r = _BitReader(b, start)
    preds = {c["id"]: 0 for c in sc}
    n_mcu = 0
    # entropy decode first (inherently serial), IDCT batched afterwards:
    # per scan component, scan-order coefficient rows + block positions
    zz_rows: dict[int, list[list[int]]] = {c["id"]: [] for c in sc}
    pos_rows: dict[int, list[tuple[int, int]]] = {c["id"]: [] for c in sc}
    if len(sc) == 1:
        # NON-interleaved (T.81 A.2.2): MCU = ONE block, iterated in the
        # component's own raster order over ceil(comp_dims / 8) blocks
        c = sc[0]
        dc_t = hufs[(0, scan[c["id"]][0])]
        ac_t = hufs[(1, scan[c["id"]][1])]
        cw = (wd * c["h"] + hmax - 1) // hmax
        chh = (h * c["v"] + vmax - 1) // vmax
        for by in range((chh + 7) // 8):
            for bx in range((cw + 7) // 8):
                if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                    r.restart()
                    preds = {c["id"]: 0}
                zz = _decode_block(r, dc_t, ac_t, preds[c["id"]])
                preds[c["id"]] = zz[0]
                zz_rows[c["id"]].append(zz)
                pos_rows[c["id"]].append((by * 8, bx * 8))
                n_mcu += 1
    else:
        mcus_x = (wd + 8 * hmax - 1) // (8 * hmax)
        mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                    r.restart()
                    preds = {c["id"]: 0 for c in sc}
                for c in sc:
                    dc_t = hufs[(0, scan[c["id"]][0])]
                    ac_t = hufs[(1, scan[c["id"]][1])]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            zz = _decode_block(r, dc_t, ac_t, preds[c["id"]])
                            preds[c["id"]] = zz[0]
                            zz_rows[c["id"]].append(zz)
                            pos_rows[c["id"]].append(
                                (
                                    (my * c["v"] + by) * 8,
                                    (mx * c["h"] + bx) * 8,
                                )
                            )
                n_mcu += 1
    for c in sc:
        plane = planes[c["id"]]
        qt = qtabs[c["tq"]]
        # ONE dequant + IDCT over every block of the component (the former
        # per-block 8x8 matmuls were pure Python-call overhead)
        zzs = np.array(zz_rows[c["id"]], dtype=np.float64).reshape(-1, 64)
        coefs = np.zeros_like(zzs)
        coefs[:, ZIGZAG] = zzs * qt[ZIGZAG][None, :]
        blocks = (
            np.einsum(
                "ij,njk,kl->nil", _C.T, coefs.reshape(-1, 8, 8), _C
            )
            + 128.0
        )
        for (y0, x0), blk in zip(pos_rows[c["id"]], blocks):
            plane[y0 : y0 + 8, x0 : x0 + 8] = blk
    # advance to the next marker: skip stuffed 0xFF00 and RSTn
    j = r.i
    while j + 1 < len(b):
        if b[j] == 0xFF and b[j + 1] != 0x00 and not (
            0xD0 <= b[j + 1] <= 0xD7
        ):
            return j
        j += 1
    return len(b)
