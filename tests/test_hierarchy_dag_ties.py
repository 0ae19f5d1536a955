"""Quantifies the DAG LCS tie-break divergence on the ILSVRC hierarchy.

The reference picks the lowest common subsumer with ``max()`` over an
unordered set (`/root/reference/class_hierarchy.py:123-140`), so when two
common subsumers share the maximum depth the winner is arbitrary
(set-iteration order); our implementation breaks those ties
deterministically (`hierarchy/class_hierarchy.py` ``_lcs_idx``: smaller
height, then smaller index).  This test measures how often that matters on
the reference's own ILSVRC pruned WordNet DAG over the 1000 training
classes, pinning the numbers quoted in PARITY.md §DAG-ties:

- 12 of 499,500 class pairs (0.0024%) have an equal-depth LCS tie;
- all 12 can shift ``lcs_height`` (max height spread 3 of max_height 19);
- 10 can shift WUP (max per-pair delta 0.137).

Worst-case effect on any [0,1]-similarity matrix entry mean:
12/499500 * 0.16 ≈ 4e-6 — far below the 0.5% parity budget.
"""

import json

import numpy as np
import pytest

from semantic_embeddings_tpu.hierarchy import ClassHierarchy

ILSVRC = "/root/reference/ILSVRC"


@pytest.mark.slow
def test_ilsvrc_dag_lcs_tie_rate(reference_dir):
    h = ClassHierarchy.from_file(f"{ILSVRC}/wordnet.parent-child.pruned.txt")
    classes = [
        v[0] for v in json.load(
            open(f"{ILSVRC}/imagenet_class_index.json")).values()
    ]
    assert len(classes) == 1000
    idx = [h._node_index[c] for c in classes]
    N = len(h.nodes)
    C = len(idx)
    depth = np.asarray(h._depth_max_arr, dtype=np.int32)
    height = np.asarray(h._height_arr, dtype=np.int32)

    A = np.zeros((C, N), dtype=bool)
    D = np.full((C, N), 10**6, dtype=np.int32)
    for r, i in enumerate(idx):
        for a, d in h._ancestors(i).items():
            A[r, a] = True
            D[r, a] = d

    ties = 0
    lcsh_affected = 0
    lcsh_max_spread = 0
    wup_affected = 0
    wup_max_delta = 0.0
    for r in range(C):
        commons = A[r] & A[r + 1:]
        cd = np.where(commons, depth[None, :], -1)
        md = cd.max(axis=1)
        at_max = cd == md[:, None]
        tied_rows = np.nonzero(at_max.sum(axis=1) > 1)[0]
        ties += len(tied_rows)
        if not len(tied_rows):
            continue
        hh_max = np.where(at_max[tied_rows], height[None, :], -1).max(axis=1)
        hh_min = np.where(at_max[tied_rows], height[None, :], 10**6).min(axis=1)
        spread = hh_max - hh_min
        lcsh_affected += int((spread > 0).sum())
        lcsh_max_spread = max(lcsh_max_spread, int(spread.max(initial=0)))
        dsum = D[r][None, :] + D[r + 1 + tied_rows]
        dmin = np.where(at_max[tied_rows], dsum, 10**6).min(axis=1)
        dmax = np.where(at_max[tied_rows], dsum, -1).max(axis=1)
        ds = md[tied_rows].astype(np.float64)
        delta = 2 * ds / (2 * ds + dmin) - 2 * ds / (2 * ds + dmax)
        wup_affected += int((delta > 1e-12).sum())
        wup_max_delta = max(wup_max_delta, float(delta.max(initial=0)))

    assert ties == 12, ties
    assert lcsh_affected == 12, lcsh_affected
    assert lcsh_max_spread == 3, lcsh_max_spread
    assert wup_affected == 10, wup_affected
    assert wup_max_delta == pytest.approx(0.13714, abs=1e-4), wup_max_delta
    # aggregate bound used in PARITY.md
    assert ties / (C * (C - 1) / 2) < 1e-4
