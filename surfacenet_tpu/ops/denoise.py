"""Point-cloud denoising: drop small floating voxel clusters (SURVEY.md C8).

The reference's ``denoising.py`` removes isolated clusters of occupied
voxels after the cube merge — thin-surface reconstruction leaves specks
where a single bad view pair fired.  The TPU build keeps this on the host
IO tail (like the sparse merge): connected components over the
26-neighborhood of the merged integer voxel coordinates, then a size
filter.  Production path is the C++ union-find (``native/denoise.cpp``,
O(N) hash grid); the numpy fallback below is a vectorized hook-and-jump
(Shiloach–Vishkin style) over the forward-neighbor edge list.

This is global, data-dependent, and tiny next to the sweep — exactly the
kind of work that belongs on the host, not in a Pallas kernel.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

# Half the 26-neighborhood (lexicographically positive offsets); the other
# half is covered by the neighbor's own forward edge.
_FORWARD_OFFSETS = np.array(
    [
        [0, 0, 1], [0, 1, -1], [0, 1, 0], [0, 1, 1],
        [1, -1, -1], [1, -1, 0], [1, -1, 1],
        [1, 0, -1], [1, 0, 0], [1, 0, 1],
        [1, 1, -1], [1, 1, 0], [1, 1, 1],
    ],
    np.int64,
)


def _pack(coords: np.ndarray) -> np.ndarray:
    """Pack (N, 3) int coords into sortable uint64 keys (21 bits/axis,
    same scheme as native/merge.cpp)."""
    c = coords.astype(np.int64) + (1 << 20)
    return (
        (c[:, 0].astype(np.uint64) << np.uint64(42))
        | (c[:, 1].astype(np.uint64) << np.uint64(21))
        | c[:, 2].astype(np.uint64)
    )


def _components_numpy(coords: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    n = len(coords)
    parent = np.arange(n, dtype=np.int64)
    if n == 0:
        return parent, parent.copy()

    keys = _pack(coords)
    order = np.argsort(keys)
    sorted_keys = keys[order]

    # Forward-neighbor edge list via binary search on the sorted keys.
    edges_a, edges_b = [], []
    for off in _FORWARD_OFFSETS:
        nk = _pack(coords + off)
        pos = np.searchsorted(sorted_keys, nk)
        pos_c = np.minimum(pos, n - 1)
        hit = sorted_keys[pos_c] == nk
        if hit.any():
            edges_a.append(np.nonzero(hit)[0])
            edges_b.append(order[pos_c[hit]])
    if edges_a:
        a = np.concatenate(edges_a)
        b = np.concatenate(edges_b)
        # Hook-and-jump: attach the larger root under the smaller, then
        # pointer-jump to full compression; O(log n) rounds, all vectorized.
        while True:
            pa, pb = parent[a], parent[b]
            diff = pa != pb
            if not diff.any():
                break
            lo = np.minimum(pa, pb)
            hi = np.maximum(pa, pb)
            np.minimum.at(parent, hi, lo)
            while True:
                nxt = parent[parent]
                if np.array_equal(nxt, parent):
                    break
                parent = nxt

    roots, inverse = np.unique(parent, return_inverse=True)
    sizes_per_comp = np.bincount(inverse, minlength=len(roots))
    return inverse.astype(np.int64), sizes_per_comp[inverse].astype(np.int64)


def connected_components(
    coords: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """26-connected components of integer voxel coordinates.

    Args:
      coords: (N, 3) integer voxel coordinates (unique).

    Returns:
      labels: (N,) int64 compact component ids in [0, n_components).
      sizes: (N,) int64 — size of the component each record belongs to.
    """
    coords = np.asarray(coords)
    if coords.ndim != 2 or coords.shape[1] != 3:
        raise ValueError(f"coords must be (N, 3), got {coords.shape}")
    from surfacenet_tpu.native import native_components

    res = native_components(coords)
    if res is not None:
        return res
    return _components_numpy(coords.astype(np.int64))


def component_filter_mask(
    coords: np.ndarray,
    min_size: int = 0,
    keep_top: Optional[int] = None,
) -> np.ndarray:
    """Boolean keep-mask over voxel records after cluster-size filtering.

    Args:
      coords: (N, 3) integer voxel coordinates.
      min_size: drop components with fewer voxels than this (0 = keep all).
      keep_top: additionally keep only the ``keep_top`` largest components
        (None = no cap).  Both filters compose (intersection).

    Returns:
      (N,) bool mask of surviving records.
    """
    n = len(coords)
    if n == 0 or (min_size <= 1 and keep_top is None):
        return np.ones(n, bool)
    labels, sizes = connected_components(coords)
    keep = sizes >= min_size
    if keep_top is not None and labels.size:
        n_comp = int(labels.max()) + 1
        comp_sizes = np.bincount(labels, minlength=n_comp)
        if n_comp > keep_top:
            top = np.argsort(comp_sizes)[::-1][: int(keep_top)]
            keep &= np.isin(labels, top)
    return keep
