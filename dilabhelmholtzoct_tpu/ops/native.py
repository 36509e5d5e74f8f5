"""ctypes bindings for the native (C++) host-side kernels.

Loads ``native/libdhoct_native.so`` (auto-building it with ``make`` on first
use when a compiler is available) and exposes the batched cubical
persistence pairing. Falls back transparently to the pure-Python reference
(ops/topology_ref.py) when no native library can be built — results are
identical, validated in tests/test_topology_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libdhoct_native.so"))

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    src = os.path.join(os.path.abspath(_NATIVE_DIR), "persistence.cc")
    stale = os.path.exists(_LIB_PATH) and os.path.exists(src) and (
        os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    )
    if not os.path.exists(_LIB_PATH) or stale:
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR), "-B"],
                check=True, capture_output=True, timeout=120,
            )
        except (subprocess.SubprocessError, FileNotFoundError, OSError):
            if stale:  # keep using the existing (older) library
                pass
            else:
                return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.cubical_pairs_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float),  # grids
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),  # h0_birth
        ctypes.POINTER(ctypes.c_int32),  # h0_death
        ctypes.POINTER(ctypes.c_int32),  # h1_birth
        ctypes.POINTER(ctypes.c_int32),  # h1_death
        ctypes.POINTER(ctypes.c_int32),  # counts
        ctypes.POINTER(ctypes.c_int32),  # h0_essential
    ]
    lib.cubical_pairs_batch.restype = None
    lib.label_components_8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.label_components_8.restype = ctypes.c_int32
    lib.extract_components.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.extract_components.restype = ctypes.c_int32
    lib.component_pixel_at.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.component_pixel_at.restype = None
    try:
        match_fn = lib.wasserstein_match_batch
    except AttributeError:  # older .so without the symbol (rebuild failed)
        match_fn = None
    if match_fn is not None:
        match_fn.argtypes = [
            ctypes.POINTER(ctypes.c_float),   # grids (n, hw)
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),   # p_birth (n, k)
            ctypes.POINTER(ctypes.c_int32),   # p_death (n, k)
            ctypes.POINTER(ctypes.c_int32),   # p_count (n,)
            ctypes.POINTER(ctypes.c_float),   # true_bars (total_t, 2)
            ctypes.POINTER(ctypes.c_int64),   # t_off (n + 1,)
            ctypes.c_double, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int8),    # matched (n, k)
            ctypes.POINTER(ctypes.c_float),   # target (n, k, 2)
            ctypes.POINTER(ctypes.c_float),   # const_term (n,)
        ]
        match_fn.restype = None
    _lib = lib
    return _lib


def have_native() -> bool:
    return _load() is not None


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def label_components_8(mask: np.ndarray):
    """8-connected component labeling; identical output to
    ``scipy.ndimage.label(mask, ones((3,3)))`` (C++ fast path, scipy
    fallback). Returns (labels int32 (H, W), n_components)."""
    lib = _load()
    if lib is None:
        from scipy import ndimage

        labels, n = ndimage.label(
            np.ascontiguousarray(mask), np.ones((3, 3), np.int32)
        )
        return labels.astype(np.int32), int(n)
    mask8 = np.ascontiguousarray(mask != 0).astype(np.uint8)
    out = np.empty(mask8.shape, np.int32)
    n = lib.label_components_8(
        _ptr(mask8, ctypes.c_uint8), mask8.shape[0], mask8.shape[1],
        _ptr(out, ctypes.c_int32),
    )
    return out, int(n)


def extract_components(label: np.ndarray, max_comps: int = 256):
    """One-pass prompt extraction from a (H, W) uint8 label map.

    Returns (comp_map (H,W) int32 with slot ids 1..n, values (n,) int32,
    bboxes (n,4) int32 xyxy, sizes (n,) int32, total_found int). None when
    the native library is unavailable (callers fall back to the pure path).
    """
    lib = _load()
    if lib is None:
        return None
    lab = np.ascontiguousarray(label, np.uint8)
    h, w = lab.shape
    comp_map = np.empty((h, w), np.int32)
    values = np.zeros((max_comps,), np.int32)
    bboxes = np.zeros((max_comps, 4), np.int32)
    sizes = np.zeros((max_comps,), np.int32)
    total = lib.extract_components(
        _ptr(lab, ctypes.c_uint8), h, w, max_comps,
        _ptr(comp_map, ctypes.c_int32), _ptr(values, ctypes.c_int32),
        _ptr(bboxes, ctypes.c_int32), _ptr(sizes, ctypes.c_int32),
    )
    n = min(int(total), max_comps)
    return comp_map, values[:n], bboxes[:n], sizes[:n], int(total)


def component_pixel_at(comp_map: np.ndarray, ranks: np.ndarray):
    """Per-slot (x, y) of the rank-th pixel (row-major) of each component."""
    lib = _load()
    n = len(ranks)
    if lib is None:
        out = np.zeros((n, 2), np.int32)
        flat = comp_map.reshape(-1)
        w = comp_map.shape[1]
        for s in range(n):
            idx = np.flatnonzero(flat == s + 1)[int(ranks[s])]
            out[s] = (idx % w, idx // w)
        return out
    cm = np.ascontiguousarray(comp_map, np.int32)
    r = np.ascontiguousarray(ranks, np.int64)
    out = np.zeros((n, 2), np.int32)
    lib.component_pixel_at(
        _ptr(cm, ctypes.c_int32), cm.shape[0], cm.shape[1], n,
        _ptr(r, ctypes.c_int64), _ptr(out, ctypes.c_int32),
    )
    return out


def cubical_pairs_batch(grids: np.ndarray, max_bars: int = 32):
    """Batched H0/H1 persistence pairing.

    grids: (N, H, W) float32. Returns dict of arrays:
      h0_birth/h0_death/h1_birth/h1_death: (N, max_bars) int32, -1 padded
      counts: (N, 2) int32 — [n_h0_finite, n_h1]
      h0_essential: (N,) int32 birth pixel of the essential H0 class
    Bars beyond max_bars are dropped lowest-persistence-first.
    """
    grids = np.ascontiguousarray(grids, np.float32)
    n, h, w = grids.shape
    out = {
        "h0_birth": np.empty((n, max_bars), np.int32),
        "h0_death": np.empty((n, max_bars), np.int32),
        "h1_birth": np.empty((n, max_bars), np.int32),
        "h1_death": np.empty((n, max_bars), np.int32),
        "counts": np.empty((n, 2), np.int32),
        "h0_essential": np.empty((n,), np.int32),
    }
    lib = _load()
    if lib is not None:
        lib.cubical_pairs_batch(
            _ptr(grids, ctypes.c_float), n, h, w, max_bars,
            _ptr(out["h0_birth"], ctypes.c_int32),
            _ptr(out["h0_death"], ctypes.c_int32),
            _ptr(out["h1_birth"], ctypes.c_int32),
            _ptr(out["h1_death"], ctypes.c_int32),
            _ptr(out["counts"], ctypes.c_int32),
            _ptr(out["h0_essential"], ctypes.c_int32),
        )
        return out

    # pure-Python fallback (identical algorithm)
    from .topology_ref import cubical_pairs as _cubical_pairs_py

    return _cubical_pairs_py_batch(grids, max_bars, out, _cubical_pairs_py)


def wasserstein_match_batch(grids, p_birth, p_death, p_count, true_diagrams,
                            q: float, max_bars: int):
    """Batched reduced-assignment Wasserstein matching (C++; see
    native/persistence.cc). Replaces the per-row Python loop over
    ``topology_ref.wasserstein_match`` — measured 11 ms/64 rows of pure
    Python/scipy overhead on this 1-core host (docs/ROADMAP.md).

    grids: (n, H, W) or (n, HW) f32 pred grids; p_birth/p_death: (n, K)
    int32 flat indices (pairing output, -1 pad); p_count: (n,) int32;
    true_diagrams: list of n (cnt_i, 2) f32 arrays. Returns
    (matched (n,K) int8, target (n,K,2) f32, const_term (n,) f32), or
    None when the native library lacks the entry point (callers fall back
    to the Python loop).
    """
    lib = _load()
    if lib is None or getattr(lib, "wasserstein_match_batch", None) is None:
        return None
    grids = np.ascontiguousarray(grids, np.float32)
    n = grids.shape[0]
    hw = int(np.prod(grids.shape[1:]))
    grids = grids.reshape(n, hw)
    p_birth = np.ascontiguousarray(p_birth, np.int32)
    p_death = np.ascontiguousarray(p_death, np.int32)
    p_count = np.ascontiguousarray(p_count, np.int32)
    t_off = np.zeros(n + 1, np.int64)
    for i, d in enumerate(true_diagrams):
        t_off[i + 1] = t_off[i] + len(d)
    if t_off[-1]:
        true_bars = np.ascontiguousarray(
            np.concatenate([np.asarray(d, np.float32).reshape(-1, 2)
                            for d in true_diagrams]), np.float32)
    else:
        true_bars = np.zeros((1, 2), np.float32)  # non-null pointer
    matched = np.zeros((n, max_bars), np.int8)
    target = np.zeros((n, max_bars, 2), np.float32)
    const_term = np.zeros((n,), np.float32)
    lib.wasserstein_match_batch(
        _ptr(grids, ctypes.c_float), n, hw,
        _ptr(p_birth, ctypes.c_int32), _ptr(p_death, ctypes.c_int32),
        _ptr(p_count, ctypes.c_int32), _ptr(true_bars, ctypes.c_float),
        _ptr(t_off, ctypes.c_int64), float(q), max_bars,
        _ptr(matched, ctypes.c_int8), _ptr(target, ctypes.c_float),
        _ptr(const_term, ctypes.c_float),
    )
    return matched, target, const_term


def _cubical_pairs_py_batch(grids, max_bars, out, cubical_pairs):
    """Pure-Python fallback body of ``cubical_pairs_batch``."""
    n = grids.shape[0]
    for g in range(n):
        pairs = cubical_pairs(grids[g])
        flat = grids[g].reshape(-1)
        for dim, key in ((0, "h0"), (1, "h1")):
            bars = pairs[key]
            if len(bars) > max_bars:
                pers = np.abs(flat[bars[:, 1]] - flat[bars[:, 0]])
                bars = bars[np.argsort(-pers, kind="stable")[:max_bars]]
            k = len(bars)
            out[f"h{dim}_birth"][g, :] = -1
            out[f"h{dim}_death"][g, :] = -1
            out[f"h{dim}_birth"][g, :k] = bars[:, 0]
            out[f"h{dim}_death"][g, :k] = bars[:, 1]
            out["counts"][g, dim] = k
        out["h0_essential"][g] = pairs["h0_essential"]
    return out
