"""Independent persistence oracle: textbook boundary-matrix reduction.

Bar-for-bar verification target for ops/topology_ref.cubical_pairs and the
C++ batch pairing (native/persistence.cc). Those implement union-find
pairing; this oracle is the *standard reduction algorithm* (Edelsbrunner–
Letscher–Zomorodian) over the full explicitly-constructed cubical complex
— a completely different algorithm and cell bookkeeping, so agreement is
strong independent evidence in an environment where gudhi cannot be
installed (zero egress). Semantics mirror gudhi's
``CubicalComplex(top_dimensional_cells=v)`` (the reference's
torch_topological backend, octsam/models/topological_loss.py:55-63):

* T-construction: the m×n grid entries are the top-dimensional (2-)cells;
  every edge/vertex takes the MIN filtration value of its incident
  2-cells.
* Persistence over Z/2 by column reduction in (value, dim)-sorted order.
* Zero-persistence intervals are dropped (gudhi ``persistence()`` keeps
  intervals with persistence strictly greater than ``min_persistence=0``).
* Essential (infinite-death) classes are reported separately.
"""

from __future__ import annotations

import numpy as np


def _build_complex(values: np.ndarray):
    """Return (cell_value, cell_dim, boundaries) for the T-construction.

    Cells are indexed: vertices first, then horizontal edges, then vertical
    edges, then faces. boundaries[i] is the list of cell indices of the
    boundary of cell i (Z/2 coefficients: duplicates impossible here).
    """
    m, n = values.shape
    vm, vn = m + 1, n + 1  # vertex grid

    def vid(i, j):
        return i * vn + j

    n_vert = vm * vn
    # horizontal edges connect (i,j)-(i,j+1): grid (m+1) x n
    def hid(i, j):
        return n_vert + i * n + j

    n_h = vm * n
    # vertical edges connect (i,j)-(i+1,j): grid m x (n+1)
    def wid(i, j):
        return n_vert + n_h + i * vn + j

    n_w = m * vn

    def fid(i, j):
        return n_vert + n_h + n_w + i * n + j

    n_cells = n_vert + n_h + n_w + m * n
    cell_value = np.full(n_cells, np.inf)
    cell_dim = np.zeros(n_cells, np.int8)
    boundaries: list[list[int]] = [[] for _ in range(n_cells)]

    # faces: value = grid entry; boundary = 4 edges
    for i in range(m):
        for j in range(n):
            f = fid(i, j)
            cell_value[f] = values[i, j]
            cell_dim[f] = 2
            boundaries[f] = [hid(i, j), hid(i + 1, j), wid(i, j), wid(i, j + 1)]

    # edges: min over incident faces; boundary = 2 vertices
    for i in range(vm):
        for j in range(n):
            e = hid(i, j)
            cell_dim[e] = 1
            boundaries[e] = [vid(i, j), vid(i, j + 1)]
            for fi in (i - 1, i):
                if 0 <= fi < m:
                    cell_value[e] = min(cell_value[e], values[fi, j])
    for i in range(m):
        for j in range(vn):
            e = wid(i, j)
            cell_dim[e] = 1
            boundaries[e] = [vid(i, j), vid(i + 1, j)]
            for fj in (j - 1, j):
                if 0 <= fj < n:
                    cell_value[e] = min(cell_value[e], values[i, fj])

    # vertices: min over incident faces
    for i in range(vm):
        for j in range(vn):
            v = vid(i, j)
            cell_dim[v] = 0
            for fi in (i - 1, i):
                for fj in (j - 1, j):
                    if 0 <= fi < m and 0 <= fj < n:
                        cell_value[v] = min(cell_value[v], values[fi, fj])

    return cell_value, cell_dim, boundaries


def persistence_by_reduction(values: np.ndarray):
    """Standard Z/2 column-reduction persistence of the T-construction.

    Returns dict with 'h0', 'h1': (k, 2) float arrays of finite
    (birth < death) intervals, and 'h0_essential', 'h1_essential': lists of
    birth values of infinite classes.
    """
    values = np.asarray(values, np.float64)
    cell_value, cell_dim, boundaries = _build_complex(values)
    n_cells = len(cell_value)

    # filtration order: by value, lower dim first on ties (faces must come
    # after their boundary cells; boundary value <= coface value by
    # construction, with equality broken by dim)
    order = sorted(range(n_cells), key=lambda c: (cell_value[c], cell_dim[c]))
    pos = np.empty(n_cells, np.int64)
    for p, c in enumerate(order):
        pos[c] = p

    # columns in filtration positions
    pivot_of: dict[int, int] = {}  # low(position) -> column position
    col: dict[int, set] = {}
    pairs = []  # (birth cell, death cell)
    positive = []  # creator cells (empty reduced column)
    for p, c in enumerate(order):
        chain = set(int(pos[b]) for b in boundaries[c])
        while chain:
            low = max(chain)
            k = pivot_of.get(low)
            if k is None:
                break
            chain ^= col[k]
        if chain:
            low = max(chain)
            pivot_of[low] = p
            col[p] = chain
            pairs.append((order[low], c))
        else:
            positive.append(p)
    # a creator is essential iff it is never killed, i.e. its position
    # never became the pivot (low) of a later column
    essential = [order[p] for p in positive if p not in pivot_of]

    out = {"h0": [], "h1": [], "h0_essential": [], "h1_essential": []}
    for b, d in pairs:
        birth, death = cell_value[b], cell_value[d]
        if birth < death:
            out[f"h{cell_dim[b]}"].append((birth, death))
    for c in essential:
        if cell_dim[c] <= 1:
            out[f"h{cell_dim[c]}_essential"].append(cell_value[c])
    return {
        "h0": np.array(sorted(out["h0"]), np.float64).reshape(-1, 2),
        "h1": np.array(sorted(out["h1"]), np.float64).reshape(-1, 2),
        "h0_essential": sorted(out["h0_essential"]),
        "h1_essential": sorted(out["h1_essential"]),
    }
