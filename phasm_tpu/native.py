"""ctypes loader for the C++ host kernels (native/phasm_native.cpp).

Load order: prebuilt `native/libphasm_native.so` -> build once with g++ into
the same directory -> None (callers fall back to the numpy implementations,
which are the tested oracles).  No pybind11 in this environment; the ABI is
plain C arrays via ctypes.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SO = os.path.join(_NATIVE_DIR, "libphasm_native.so")

_lib = None
_tried = False
_ABI_VERSION = 5  # must match phasm_native_abi_version() in the .cpp


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "phasm_native.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-Wall",
             "-pthread", "-shared", "-o", _SO, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # pragma: no cover
        log.warning("native build failed: %s", e)
        return False


def get_lib():
    """The loaded library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:  # pragma: no cover
        log.warning("native load failed: %s", e)
        return None
    # stale prebuilt .so (older ABI): rebuild once, reload
    try:
        lib.phasm_native_abi_version.restype = ctypes.c_int64
        stale = lib.phasm_native_abi_version() != _ABI_VERSION
    except AttributeError:
        stale = True
    if stale:
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:  # pragma: no cover
            log.warning("native reload failed: %s", e)
            return None

    i64, i32, u64, u8 = (
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_uint64,
        ctypes.c_uint8,
    )
    p = ctypes.POINTER
    lib.extract_minimizers.restype = i64
    lib.extract_minimizers.argtypes = [
        p(u8), i64, i64, p(i32), i32, i32, p(i32), p(i32), p(u64), p(u8), i64,
    ]
    lib.match_seed_pairs.restype = i64
    lib.match_seed_pairs.argtypes = [
        p(i32), p(i32), p(u64), p(u8), i64, p(i32), i32, i32, i32, i32,
        p(i32), p(i32), p(i32), p(i32), i64,
    ]
    lib.pack_2bit.restype = None
    lib.pack_2bit.argtypes = [p(u8), i64, p(u8)]
    lib.sort_u64_order.restype = None
    lib.sort_u64_order.argtypes = [p(u64), i64, p(i64)]
    lib.pair_histogram.restype = i64
    lib.pair_histogram.argtypes = [
        p(i32), p(i32), p(i32), p(i32), i64, i64, i32, i32,
        p(i32), p(i32), p(i32), p(i32), p(i32), i64,
    ]
    _lib = lib
    return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def extract_minimizers_native(codes, lengths, k, w):
    """C++ minimizer extraction; returns (read_id, pos, canon, orient) or None."""
    lib = get_lib()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    lengths = np.ascontiguousarray(lengths, dtype=np.int32)
    n, lpad = codes.shape
    cap = int(codes.shape[0] * max(codes.shape[1] // max(w // 2, 1), 8) + 1024)
    while True:
        out_read = np.empty(cap, np.int32)
        out_pos = np.empty(cap, np.int32)
        out_canon = np.empty(cap, np.uint64)
        out_orient = np.empty(cap, np.uint8)
        got = lib.extract_minimizers(
            _ptr(codes, ctypes.c_uint8), n, lpad, _ptr(lengths, ctypes.c_int32),
            k, w, _ptr(out_read, ctypes.c_int32), _ptr(out_pos, ctypes.c_int32),
            _ptr(out_canon, ctypes.c_uint64), _ptr(out_orient, ctypes.c_uint8),
            cap,
        )
        if got >= 0:
            return out_read[:got], out_pos[:got], out_canon[:got], out_orient[:got]
        cap *= 2


def match_seed_pairs_native(
    read_id, pos, canon, orient, lengths, k, max_occ, cross_split=-1,
    presorted=False,
):
    """C++ per-bucket pair emission; returns (a, b, strand, diag) or None.

    cross_split >= 0 emits only pairs with a < cross_split <= b (block-tile
    mode, see overlap_reads_blocked).  presorted=True asserts the seed
    arrays are already sorted by (canon, read_id) — skips the in-C++ sort
    (the production path sorts once in numpy; see seeding.sort_seeds)."""
    lib = get_lib()
    if lib is None:
        return None
    read_id = np.ascontiguousarray(read_id, dtype=np.int32)
    pos = np.ascontiguousarray(pos, dtype=np.int32)
    canon = np.ascontiguousarray(canon, dtype=np.uint64)
    orient = np.ascontiguousarray(orient, dtype=np.uint8)
    lengths = np.ascontiguousarray(lengths, dtype=np.int32)
    cap = max(int(read_id.shape[0]) * 8, 1 << 16)
    while True:
        a = np.empty(cap, np.int32)
        b = np.empty(cap, np.int32)
        st = np.empty(cap, np.int32)
        dg = np.empty(cap, np.int32)
        got = lib.match_seed_pairs(
            _ptr(read_id, ctypes.c_int32), _ptr(pos, ctypes.c_int32),
            _ptr(canon, ctypes.c_uint64), _ptr(orient, ctypes.c_uint8),
            read_id.shape[0], _ptr(lengths, ctypes.c_int32), k, max_occ,
            int(cross_split), int(bool(presorted)),
            _ptr(a, ctypes.c_int32), _ptr(b, ctypes.c_int32),
            _ptr(st, ctypes.c_int32), _ptr(dg, ctypes.c_int32), cap,
        )
        if got >= 0:
            return a[:got], b[:got], st[:got], dg[:got]
        cap *= 2


def sort_u64_order_native(keys: np.ndarray):
    """Stable radix argsort of uint64 keys; returns int64 order or None."""
    lib = get_lib()
    if lib is None:
        return None
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    order = np.empty(keys.shape[0], dtype=np.int64)
    lib.sort_u64_order(
        _ptr(keys, ctypes.c_uint64), keys.shape[0],
        _ptr(order, ctypes.c_int64),
    )
    return order


def pair_histogram_native(a, b, st, diag, n_reads, diag_band, min_seeds):
    """C++ candidate histogram (see phasm_native.cpp pair_histogram);
    returns (a, b, strand, d0, n_seeds) or None."""
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, dtype=np.int32)
    b = np.ascontiguousarray(b, dtype=np.int32)
    st = np.ascontiguousarray(st, dtype=np.int32)
    diag = np.ascontiguousarray(diag, dtype=np.int32)
    cap = max(int(a.shape[0]), 1024)
    while True:
        oa = np.empty(cap, np.int32)
        ob = np.empty(cap, np.int32)
        os_ = np.empty(cap, np.int32)
        od = np.empty(cap, np.int32)
        oc = np.empty(cap, np.int32)
        got = lib.pair_histogram(
            _ptr(a, ctypes.c_int32), _ptr(b, ctypes.c_int32),
            _ptr(st, ctypes.c_int32), _ptr(diag, ctypes.c_int32),
            a.shape[0], int(n_reads), int(diag_band), int(min_seeds),
            _ptr(oa, ctypes.c_int32), _ptr(ob, ctypes.c_int32),
            _ptr(os_, ctypes.c_int32), _ptr(od, ctypes.c_int32),
            _ptr(oc, ctypes.c_int32), cap,
        )
        if got >= 0:
            return oa[:got], ob[:got], os_[:got], od[:got], oc[:got]
        cap *= 2


def _bind_polish(lib):
    import ctypes

    if getattr(lib, "_polish_bound", False):
        return
    i64, i32, u8 = ctypes.c_int64, ctypes.c_int32, ctypes.c_uint8
    p = ctypes.POINTER
    lib.polish_new.restype = ctypes.c_void_p
    lib.polish_new.argtypes = [p(u8), i64]
    lib.polish_free.restype = None
    lib.polish_free.argtypes = [ctypes.c_void_p]
    lib.polish_add.restype = ctypes.c_int
    lib.polish_add.argtypes = [ctypes.c_void_p, p(u8), i32, i64, i64, i32]
    lib.polish_finish.restype = i64
    lib.polish_finish.argtypes = [ctypes.c_void_p, i32, p(u8), i64, p(i64)]
    lib._polish_bound = True


def polish_native(draft, member_seqs, member_offsets, band=128, min_cov=3,
                  iters=2):
    """Pileup-consensus polish of a draft sequence from its member reads.

    Anchor-chained banded realignment per read + per-position voting, with
    INSERTION SEGMENTS voted as whole strings and multi-base draft gaps —
    e.g. unitig spelling junctions — restored via the weighted medoid of
    the observed segments.  `iters` rounds run at fixed placements (member
    offsets are remapped through the old->new coordinate map each round),
    letting per-base voting clean the spliced regions; re-seeding between
    rounds is NOT done (the round-3 lesson: re-seeding against the rewritten
    draft corrupted low-coverage tails).  Semantics of one round mirrored by
    the pure-python oracle `phasm_tpu.polish_oracle.polish_oracle` (equality
    tested in tests/test_native.py).

    draft          uint8 base codes
    member_seqs    list of uint8 arrays (oriented member read codes)
    member_offsets list of int draft start offsets
    Returns the polished uint8 array, or None if native lib unavailable.
    """
    import ctypes

    lib = get_lib()
    if lib is None or not hasattr(lib, "polish_new"):
        return None
    _bind_polish(lib)

    draft = np.ascontiguousarray(draft, dtype=np.uint8)
    offsets = [int(o) for o in member_offsets]
    pad = band  # full-band slack each side: draft gaps shift true spans
    for it in range(max(iters, 1)):
        n = draft.shape[0]
        if n == 0:
            return draft
        h = lib.polish_new(_ptr(draft, ctypes.c_uint8), n)
        try:
            for seq, off in zip(member_seqs, offsets):
                seq = np.ascontiguousarray(seq, dtype=np.uint8)
                w0 = max(off - pad, 0)
                w1 = min(off + seq.shape[0] + pad, n)
                lib.polish_add(
                    h, _ptr(seq, ctypes.c_uint8), seq.shape[0], w0, w1, band,
                )
            cap = n + n // 2 + 4096
            out = np.empty(cap, dtype=np.uint8)
            pos_map = np.empty(n + 1, dtype=np.int64)
            got = lib.polish_finish(
                h, min_cov, _ptr(out, ctypes.c_uint8), cap,
                _ptr(pos_map, ctypes.c_int64),
            )
        finally:
            lib.polish_free(h)
        if got < 0:
            return None
        new_draft = out[:got].copy()
        if it + 1 < iters:
            offsets = [int(pos_map[min(max(o, 0), n)]) for o in offsets]
            if new_draft.shape[0] == draft.shape[0] and np.array_equal(
                new_draft, draft
            ):
                return new_draft  # converged early
        draft = new_draft
    return draft
