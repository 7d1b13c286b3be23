"""Host-DRAM row staging ops, with an optional native C++ backend.

The reference's cache manager stages rows between CPU and GPU with CUDA
``index_select`` / ``index_copy_`` on pinned memory (implied by the buffer_size /
async-copy flags, /root/reference/recsys/dlrm_main.py:121,134). On a TPU-VM the host
side of that staging is a plain DRAM gather/scatter over a table that can be 90+ GB;
single-threaded ``np.take`` becomes the bottleneck, so ``libhostops.so``
(cachedembedding_tpu/_native/hostops.cpp) provides multi-threaded row gather/scatter
via ctypes. Falls back to numpy transparently when the library isn't built.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_TRIED = False


def tune_malloc(threshold: int = 1 << 30) -> bool:
    """Raise glibc's mmap threshold so multi-MB transient buffers (gather
    staging, device->host readbacks) are served from the reusable heap arena
    instead of fresh mmaps. Fresh mmaps re-fault every page on every allocation,
    which on TPU-VM hosts runs at ~0.1 GB/s — this single knob removes that tax
    for the whole process. M_MMAP_THRESHOLD == -3 in glibc's mallopt."""
    try:
        libc = ctypes.CDLL(None)
        return bool(libc.mallopt(-3, ctypes.c_int(threshold)))
    except Exception:
        return False


_MALLOC_TUNED = tune_malloc()


def _load_lib():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = os.path.join(os.path.dirname(__file__), "libhostops.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.gather_rows_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.scatter_rows_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.fill_uniform_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_float, ctypes.c_float, ctypes.c_uint64,
        ]
        lib.bincount_i32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.sort_plan_i32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.pack_ids_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.escape_pack_window_i32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.escape_pack_window_i32.restype = ctypes.c_int64
        lib.rt_state_create.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.rt_state_create.restype = ctypes.c_void_p
        lib.rt_state_free.argtypes = [ctypes.c_void_p]
        lib.rt_encode_window.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.rt_encode_window.restype = ctypes.c_int64
        lib.fill_rows_canonical.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint32, ctypes.c_float,
        ]
        lib.alloc_hugepage.argtypes = [ctypes.c_uint64]
        lib.alloc_hugepage.restype = ctypes.c_void_p
        lib.free_hugepage.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        _LIB = lib
    except (OSError, AttributeError):  # missing .so or a stale build
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load_lib() is not None


def alloc_table(rows: int, dim: int, dtype=np.float32) -> np.ndarray:
    """Allocate an uninitialized (rows, dim) host table backed by THP huge pages
    when the native lib is available — first-touch page faults on 4 KB pages run
    at ~0.15 GB/s on TPU-VM hosts, which would add minutes per 10 GB of table."""
    lib = _load_lib()
    nbytes = rows * dim * np.dtype(dtype).itemsize
    if lib is not None:
        ptr = lib.alloc_hugepage(ctypes.c_uint64(nbytes))
        if ptr:
            buf = (ctypes.c_byte * nbytes).from_address(ptr)
            arr = np.frombuffer(buf, dtype=dtype).reshape(rows, dim)
            # keep the mapping alive with the array; freed at process exit
            arr.flags.writeable = True
            return arr
    # fallback must be ZEROED: mmap'd native allocations are zero pages, and
    # weight_init='zeros' (the checkpoint-load path) relies on that
    return np.zeros((rows, dim), dtype=dtype)


def gather_rows(table: np.ndarray, idx: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
    """out[i] = table[idx[i]] for 2-D float32 C-contiguous ``table``."""
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    if out is None:
        out = np.empty((idx.shape[0], table.shape[1]), dtype=table.dtype)
    lib = _load_lib()
    if lib is not None and table.dtype == np.float32 and table.flags.c_contiguous:
        lib.gather_rows_f32(
            table.ctypes.data, idx.ctypes.data, out.ctypes.data,
            idx.shape[0], table.shape[1], table.shape[0],
        )
        return out
    np.take(table, idx, axis=0, out=out)
    return out


def scatter_rows(table: np.ndarray, idx: np.ndarray, values: np.ndarray) -> None:
    """table[idx[i]] = values[i]."""
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    values = np.ascontiguousarray(values, dtype=table.dtype)
    lib = _load_lib()
    if lib is not None and table.dtype == np.float32 and table.flags.c_contiguous:
        lib.scatter_rows_f32(
            table.ctypes.data, idx.ctypes.data, values.ctypes.data,
            idx.shape[0], table.shape[1], table.shape[0],
        )
        return
    table[idx] = values


def fill_uniform(buf: np.ndarray, low: float, high: float, seed: int) -> None:
    """Fill a float32 buffer with U(low, high) — multithreaded for multi-GB tables."""
    lib = _load_lib()
    flat = buf.reshape(-1)
    if lib is not None and buf.dtype == np.float32 and buf.flags.c_contiguous:
        lib.fill_uniform_f32(flat.ctypes.data, flat.shape[0], low, high, seed)
        return
    rng = np.random.default_rng(seed)
    # chunked to bound temp memory
    chunk = 1 << 24
    for i in range(0, flat.shape[0], chunk):
        n = min(chunk, flat.shape[0] - i)
        flat[i : i + n] = rng.uniform(low, high, size=n).astype(np.float32)


def _mix32_np(x: np.ndarray) -> np.ndarray:
    """numpy mirror of the canonical 32-bit hash (gen_row_canonical in
    hostops.cpp and ops/synth_rows.py — keep all three in lockstep)."""
    x = x.astype(np.uint32)
    x ^= x >> np.uint32(16)
    x *= np.uint32(0x7FEB352D)
    x ^= x >> np.uint32(15)
    x *= np.uint32(0x846CA68B)
    x ^= x >> np.uint32(16)
    return x


def gen_rows_canonical(rows: np.ndarray, seed: int, bounds: np.ndarray, dim: int) -> np.ndarray:
    """(n, dim) canonical procedural init rows — numpy reference/fallback."""
    with np.errstate(over="ignore"):
        h0 = _mix32_np(
            rows.astype(np.uint32) * np.uint32(0x9E3779B1) + np.uint32(seed)
        )
        j = (
            np.arange(dim, dtype=np.uint32) * np.uint32(0x85EBCA77) + np.uint32(1)
        )
        h = _mix32_np(h0[:, None] ^ j[None, :])
    scale = (2.0 * bounds.astype(np.float32) * np.float32(1.0 / 16777216.0)).astype(np.float32)
    v = (h >> np.uint32(8)).astype(np.float32) * scale[:, None]
    return v - bounds.astype(np.float32)[:, None]


def fill_rows_canonical(buf: np.ndarray, start_row: int, seed: int, bound: float) -> None:
    """Init rows [start_row, start_row+len(buf)) of a float32 table slab with
    the canonical generator (device-reproducible; see gen_row_canonical)."""
    lib = _load_lib()
    n, dim = buf.shape
    if lib is not None and buf.dtype == np.float32 and buf.flags.c_contiguous:
        lib.fill_rows_canonical(
            buf.ctypes.data, start_row, n, dim,
            ctypes.c_uint32(seed & 0xFFFFFFFF), ctypes.c_float(bound),
        )
        return
    chunk = max(1, (1 << 22) // dim)
    for i in range(0, n, chunk):
        e = min(i + chunk, n)
        rows = np.arange(start_row + i, start_row + e, dtype=np.int64)
        buf[i:e] = gen_rows_canonical(
            rows, seed, np.full(e - i, bound, np.float32), dim
        )


def id_pack_width(max_id_exclusive: int, n: int) -> int:
    """Smallest supported pack width (bits) for ids in [0, max_id_exclusive).
    Returns 16, 20, 24 or 32 (= don't pack). 20-bit packs ids in pairs, so it
    needs an even count."""
    if max_id_exclusive <= (1 << 16):
        return 16
    if max_id_exclusive <= (1 << 20) and n % 2 == 0:
        return 20
    if max_id_exclusive <= (1 << 24):
        return 24
    return 32


def pack_ids(ids: np.ndarray, width_bits: int) -> np.ndarray:
    """Bit-pack non-negative int32 ids to a u8 stream (see pack_ids_u8)."""
    ids = np.ascontiguousarray(ids.reshape(-1), np.int32)
    n = ids.shape[0]
    nbytes = {16: 2 * n, 20: 5 * (n // 2), 24: 3 * n}[width_bits]
    out = np.empty((nbytes,), np.uint8)
    lib = _load_lib()
    if lib is not None:
        lib.pack_ids_u8(ids.ctypes.data, n, width_bits, out.ctypes.data)
        return out
    u = ids.astype(np.uint32)
    if width_bits == 16:
        b = out.reshape(n, 2)
        b[:, 0] = u & 0xFF
        b[:, 1] = (u >> 8) & 0xFF
    elif width_bits == 24:
        b = out.reshape(n, 3)
        b[:, 0] = u & 0xFF
        b[:, 1] = (u >> 8) & 0xFF
        b[:, 2] = (u >> 16) & 0xFF
    else:
        a0, a1 = u[0::2], u[1::2]
        b = out.reshape(n // 2, 5)
        b[:, 0] = a0 & 0xFF
        b[:, 1] = (a0 >> 8) & 0xFF
        b[:, 2] = ((a0 >> 16) & 0xF) | ((a1 & 0xF) << 4)
        b[:, 3] = (a1 >> 4) & 0xFF
        b[:, 4] = (a1 >> 12) & 0xFF
    return out


def nibble_width(max_id_exclusive: int, n: int) -> int:
    """Smallest nibble-aligned pack width (bits) for ids in [0, max_id_exclusive)
    with element count n. Odd-nibble widths (4/12/20/28) pack element PAIRS, so
    they need n even; otherwise the next byte-aligned width is used."""
    bits = max(int(max_id_exclusive - 1).bit_length(), 1)
    w = ((bits + 3) // 4) * 4
    if w % 8 and n % 2:
        w += 4
    return min(w, 32)


def pf_nbytes(n: int, width_bits: int) -> int:
    """Byte length of n ids packed at width_bits (nibble-aligned)."""
    assert (n * width_bits) % 8 == 0
    return n * width_bits // 8


def pack_ids_any(ids: np.ndarray, width_bits: int) -> np.ndarray:
    """Bit-pack non-negative int32 ids at any nibble-aligned width 4..32.
    Byte-aligned widths reuse pack_ids; odd-nibble widths pack pairs
    little-endian (two w-bit ids in w/4 bytes)."""
    ids = np.ascontiguousarray(ids.reshape(-1), np.int32)
    n = ids.shape[0]
    if width_bits == 32:
        return ids.view(np.uint8)
    if width_bits in (16, 20, 24):
        return pack_ids(ids, width_bits)
    u = ids.astype(np.uint64)
    if width_bits == 8:
        return u.astype(np.uint8)
    # pair widths: 4, 12, 28
    assert width_bits in (4, 12, 28) and n % 2 == 0, (width_bits, n)
    k = width_bits // 4  # bytes per pair
    combined = u[0::2] | (u[1::2] << np.uint64(width_bits))
    out = np.empty((n // 2, k), np.uint8)
    for j in range(k):
        out[:, j] = ((combined >> np.uint64(8 * j)) & np.uint64(0xFF)).astype(np.uint8)
    return out.reshape(-1)


def escape_pack_window(
    slot3: np.ndarray,
    widths: np.ndarray,
    plain_widths: np.ndarray,
    deltas: np.ndarray,
    max_overflow: int,
):
    """Native windowed escape-coded id pack (ONE multithreaded C++ call for
    all F feature blocks — replaces a 26-iteration python loop of per-feature
    mask/nonzero/pack passes, the largest post-plan host cost per window).

    slot3: (P, F, Bf) int32. Returns (packed_bytes, escape_pos u32 (count,),
    escape_val i32 (count,)) with escapes ordered (feature, p, j) — the same
    bytes/order as the python encoder. Returns None when the native lib is
    absent (caller uses the python encoder) and False when the window's
    escapes exceed ``max_overflow`` (caller falls back to the plain format)."""
    lib = _load_lib()
    if lib is None:
        return None
    P, F, Bf = slot3.shape
    slot3 = np.ascontiguousarray(slot3, np.int32)
    w = np.ascontiguousarray(widths, np.int32)
    pw = np.ascontiguousarray(plain_widths, np.int32)
    d = np.ascontiguousarray(deltas, np.int32)
    sizes = (P * Bf * w.astype(np.int64)) // 8
    offs = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
    out = np.empty((int(offs[-1]),), np.uint8)
    cap = max(int(max_overflow), 1)
    opos = np.empty((cap,), np.uint32)
    oval = np.empty((cap,), np.int32)
    cnt = lib.escape_pack_window_i32(
        slot3.ctypes.data, P, F, Bf,
        w.ctypes.data, pw.ctypes.data, d.ctypes.data,
        offs.ctypes.data, out.ctypes.data,
        opos.ctypes.data, oval.ctypes.data, int(max_overflow),
    )
    if cnt < 0:
        return False
    return out, opos[:cnt], oval[:cnt]


class RankTierEncoder:
    """Stateful native rank-tier window encoder (trainer._tier_encode's
    steady-state path in ONE C++ call per window). The numpy encoder costs
    ~220 ms per headline window — np.unique sorts 131k values per dict
    feature — and this host has one core, so it would become the critical
    path (device budget ~115 ms/window); this class is what makes
    id_wire="ranktier" defaultable.

    Rank dictionaries persist across windows inside the C++ state and are
    rebuilt only when ``encode(..., rebuild=True)``: the dict ships with
    every window, so encoding against a slightly stale dict decodes exactly —
    drift only shifts tier shares, which the frozen caps guard (overflow ->
    plain fallback, same as the numpy path). Dict rank TIE-BREAKS may differ
    from numpy's argpartition; the decode is invariant.

    Construct via ``make_ranktier_encoder`` (returns None without the lib)."""

    def __init__(self, lib, entries: tuple, caps_per_feature: list, max_val: int):
        F = len(entries)
        ent_type = np.zeros((F,), np.int32)
        widths = np.zeros((F, 4), np.int32)
        deltas = np.zeros((F,), np.int32)
        plain_w = np.zeros((F,), np.int32)
        caps = np.zeros((F, 4), np.int32)
        dict_ks = np.zeros((F,), np.int32)
        # per-element byte sizes: [n-multiplier, constant] per feature
        self._sz_mul = np.zeros((F,), np.float64)
        self._sz_const = np.zeros((F,), np.int64)
        for f, ent in enumerate(entries):
            if ent[0] == "p":
                _, w, delta, wp = ent
                widths[f, 0] = w
                deltas[f] = delta
                plain_w[f] = wp
                self._sz_mul[f] = w / 8.0
            else:
                _, ws, delta, _shares, dict_k = ent
                ent_type[f] = 1
                widths[f] = ws
                deltas[f] = delta
                dict_ks[f] = dict_k
                cf = caps_per_feature[f]
                caps[f] = cf
                self._sz_mul[f] = 0.25  # selector bytes
                self._sz_const[f] = 4 * dict_k + sum(
                    (int(c) * int(w)) // 8 for c, w in zip(cf, ws)
                )
        self._lib = lib
        self._handle = lib.rt_state_create(
            F, int(max_val),
            ent_type.ctypes.data, widths.ctypes.data, deltas.ctypes.data,
            plain_w.ctypes.data, caps.ctypes.data, dict_ks.ctypes.data,
        )
        self._F = F

    def __del__(self):
        h = getattr(self, "_handle", None)
        if h:
            self._lib.rt_state_free(h)
            self._handle = None

    def encode(self, slot3: np.ndarray, max_overflow: int, rebuild: bool):
        """Encode one (P, F, Bf) window. Returns (feature_block_bytes,
        esc_pos u32 (count,), esc_val i32 (count,)), or ("overflow", f,
        cnts, caps) on a tier-cap overflow, or "esc_overflow" when plain
        escapes exceed ``max_overflow`` (caller ships the plain format).
        The FIRST call must pass rebuild=True (dictionaries start empty)."""
        P, F, Bf = slot3.shape
        assert F == self._F
        n = P * Bf
        slot3 = np.ascontiguousarray(slot3, np.int32)
        sizes = (self._sz_mul * n).astype(np.int64) + self._sz_const
        offs = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
        out = np.empty((int(offs[-1]),), np.uint8)
        cap_esc = max(int(max_overflow), 1)
        opos = np.empty((cap_esc,), np.uint32)
        oval = np.empty((cap_esc,), np.int32)
        info = np.zeros((9,), np.int32)
        cnt = self._lib.rt_encode_window(
            self._handle, slot3.ctypes.data, P, Bf, 1 if rebuild else 0,
            offs.ctypes.data, out.ctypes.data,
            opos.ctypes.data, oval.ctypes.data, int(max_overflow),
            info.ctypes.data,
        )
        if cnt == -1:
            return ("overflow", int(info[0]), [int(x) for x in info[1:5]],
                    tuple(int(x) for x in info[5:9]))
        if cnt == -2:
            return "esc_overflow"
        return out, opos[:cnt], oval[:cnt]


def make_ranktier_encoder(entries: tuple, caps_per_feature: list, max_val: int):
    """RankTierEncoder factory; None when the native lib is absent (caller
    runs the numpy encoder)."""
    lib = _load_lib()
    if lib is None or not hasattr(lib, "rt_state_create"):
        return None
    return RankTierEncoder(lib, entries, caps_per_feature, max_val)


def sort_plan(ids: np.ndarray, num_rows: int, block_rows: int = 256):
    """Bin-grouping plan for the Pallas binned scatter-add backward
    (ops/binned_scatter.py): returns (perm, ids_grouped, bin_starts) with the
    id stream stably grouped by (id // block_rows). Native counting sort (two
    linear passes) when built; np.argsort fallback otherwise."""
    ids = np.ascontiguousarray(ids.reshape(-1), dtype=np.int32)
    n = ids.shape[0]
    nb = -(-num_rows // block_rows)
    lib = _load_lib()
    if lib is not None:
        perm = np.empty((n,), np.int32)
        grouped = np.empty((n,), np.int32)
        bin_starts = np.empty((nb + 1,), np.int32)
        lib.sort_plan_i32(
            ids.ctypes.data, n, num_rows, block_rows,
            perm.ctypes.data, grouped.ctypes.data, bin_starts.ctypes.data,
        )
        return perm, grouped, bin_starts
    perm = np.argsort(ids, kind="stable").astype(np.int32)
    grouped = ids[perm]
    bounds = block_rows * np.arange(nb + 1, dtype=np.int64)
    bin_starts = np.searchsorted(grouped, bounds).astype(np.int32)
    return perm, grouped, bin_starts


def bincount(ids: np.ndarray, num_rows: int, out: np.ndarray | None = None) -> np.ndarray:
    """Accumulating int64 bincount (the id-frequency pass,
    /root/reference/recsys/datasets/feature_counter.py:21-29)."""
    if out is None:
        out = np.zeros((num_rows,), dtype=np.int64)
    lib = _load_lib()
    ids = np.ascontiguousarray(ids.reshape(-1), dtype=np.int64)
    if lib is not None and out.flags.c_contiguous:
        lib.bincount_i32(ids.ctypes.data, out.ctypes.data, ids.shape[0], num_rows)
        return out
    out += np.bincount(ids, minlength=num_rows).astype(np.int64)
    return out
