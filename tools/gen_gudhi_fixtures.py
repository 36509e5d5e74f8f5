"""Regenerate tests/fixtures/gudhi_diagrams.npz from a LIVE gudhi.

The zero-egress build image cannot install gudhi, so
``tests/test_topology.py::test_diagrams_match_gudhi`` normally validates
against the independent boundary-matrix-reduction oracle
(tests/persistence_oracle.py). gudhi itself — literally what the
reference's torch_topological computes (octsam/models/
topological_loss.py:55-63) — remains the authority: run this script in ANY
environment where ``pip install gudhi`` works and commit the resulting
fixture file; the test then checks bar-for-bar against recorded gudhi
output in preference to the oracle.

Usage (in a gudhi-capable environment, from the repo root):

    python tools/gen_gudhi_fixtures.py

The grids are regenerated here with the exact same RNG recipe the test
uses; each grid is stored alongside its diagrams so the test can verify
the fixture matches its input (guards against RNG/version drift).
"""

from __future__ import annotations

import os

import numpy as np

SEEDS = range(4)          # must match test_diagrams_match_gudhi's params
SHAPE = (16, 16)

OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures",
    "gudhi_diagrams.npz",
)


def grid_for_seed(seed: int) -> np.ndarray:
    """The exact grid test_diagrams_match_gudhi builds for ``seed``."""
    return np.random.default_rng(seed).random(SHAPE)


def main():
    import gudhi  # hard requirement here, by design

    arrays = {}
    for seed in SEEDS:
        v = grid_for_seed(seed)
        cc = gudhi.CubicalComplex(top_dimensional_cells=v)
        cc.compute_persistence()
        h0 = np.array(
            sorted((b, d) for b, d in cc.persistence_intervals_in_dimension(0)
                   if np.isfinite(d)),
            np.float64,
        ).reshape(-1, 2)
        h1 = np.array(
            sorted((b, d) for b, d in cc.persistence_intervals_in_dimension(1)
                   if np.isfinite(d)),
            np.float64,
        ).reshape(-1, 2)
        arrays[f"grid_{seed}"] = v
        arrays[f"h0_{seed}"] = h0
        arrays[f"h1_{seed}"] = h1
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, gudhi_version=gudhi.__version__, **arrays)
    print(f"[gudhi-fixtures] wrote {os.path.abspath(OUT)} "
          f"(gudhi {gudhi.__version__}, seeds {list(SEEDS)})")


if __name__ == "__main__":
    main()
