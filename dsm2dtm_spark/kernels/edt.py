"""Exact Euclidean distance transform with nearest-site indices, pure numpy.

Drop-in for the reference's uses of ``scipy.ndimage.distance_transform_edt(
mask, return_distances=True, return_indices=True)`` (algorithm.py:313, 332,
437): for every True ("invalid") cell of ``mask``, the Euclidean distance to —
and the (row, col) index of — the nearest False ("valid") cell. False cells map
to themselves at distance 0.

Algorithm (from scratch, exact, O(h·w) total):

1. Column scan: for every (i, j), the nearest valid row i*(i, j) within column
   j and its distance g = |i − i*| (two vectorized accumulate scans).
2. Row transform: minimize (j − q)² + g(i, q)² over source columns q with the
   Felzenszwalb–Huttenlocher lower-envelope-of-parabolas method, vectorized
   ACROSS all rows at once: the per-row stack pointers advance in lockstep
   with masked pop/advance rounds, so the Python loop is O(w) amortized while
   every step does O(h) vector work.

Tie-breaking on equidistant sites prefers the smaller source column / upper
row; scipy's scan order may differ at exact ties — fixtures avoid
tie-sensitive assertions (SURVEY.md §2.1 parity notes).
"""

from __future__ import annotations

import numpy as np

_BIG = 1.0e18  # finite sentinel (inf would produce nan in envelope intersections)


def _envelope_transform(f: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-row 1-D squared-distance transform: out[i, j] = min_q (j−q)² + f[i, q].

    Returns (min value, argmin q). ``f`` must be float64 with values < _BIG*2.
    Vectorized Felzenszwalb–Huttenlocher across rows.
    """
    h, w = f.shape
    rows = np.arange(h)
    v = np.zeros((h, w), dtype=np.int64)  # parabola stacks (positions q)
    z = np.full((h, w + 1), np.inf)  # envelope boundaries
    z[:, 0] = -np.inf
    k = np.zeros(h, dtype=np.int64)  # stack tops

    for q in range(1, w):
        fq = f[:, q] + float(q * q)
        while True:
            vk = v[rows, k]
            s = (fq - (f[rows, vk] + vk.astype(np.float64) ** 2)) / (2.0 * (q - vk))
            pop = (s <= z[rows, k]) & (k > 0)
            if not pop.any():
                break
            k[pop] -= 1
        k += 1
        v[rows, k] = q
        z[rows, k] = s
        z[rows, k + 1] = np.inf

    out = np.empty((h, w), dtype=np.float64)
    arg = np.empty((h, w), dtype=np.int64)
    ptr = np.zeros(h, dtype=np.int64)
    for j in range(w):
        while True:
            adv = z[rows, ptr + 1] < j
            if not adv.any():
                break
            ptr[adv] += 1
        vp = v[rows, ptr]
        arg[:, j] = vp
        out[:, j] = (j - vp.astype(np.float64)) ** 2 + f[rows, vp]
    return out, arg


def edt_with_indices(mask: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return (squared distances, nearest_row, nearest_col) for boolean ``mask``.

    ``dist2[i,j]`` = squared Euclidean distance from (i,j) to the nearest cell
    with ``mask == False``; 0 where mask is False. ``nearest_row/col`` index
    that cell (self where mask is False). Requires at least one False cell.
    Squared distances are exact integers in float64 — callers compare
    ``dist2 <= threshold**2``, equivalent to scipy's ``dist <= threshold`` and
    a full-array sqrt cheaper.
    """
    mask = np.asarray(mask, dtype=bool)
    h, w = mask.shape
    if not (~mask).any():
        raise ValueError("edt_with_indices requires at least one valid (False) cell")

    rows = np.arange(h, dtype=np.int32)[:, None]
    # nearest valid row at-or-above: maximum.accumulate of valid row indices
    up = np.where(~mask, rows, np.int32(-1))
    up = np.maximum.accumulate(up, axis=0)  # -1 where none above
    # nearest valid row at-or-below
    down = np.where(~mask, rows, np.int32(2 * h))
    down = np.minimum.accumulate(down[::-1], axis=0)[::-1]  # 2h where none below

    big_i = np.int32(1 << 30)
    dup = np.where(up >= 0, rows - up, big_i)
    ddn = np.where(down < h, down - rows, big_i)
    use_up = dup <= ddn  # prefer the upward site on row-distance ties
    g = np.where(use_up, dup, ddn)
    gr = np.where(use_up, up, down)  # chosen source row per (i, j)

    g2 = np.where(g >= big_i, _BIG, g.astype(np.float64) ** 2)
    dist2, qstar = _envelope_transform(g2)

    nearest_col = qstar
    nearest_row = np.take_along_axis(gr, qstar.astype(np.int32), axis=1)
    return dist2, nearest_row, nearest_col


def nearest_valid_sparse(mask: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """Sparse-case exact nearest-valid search: when few cells are invalid,
    search a growing (2R+1)² window around each invalid cell; a hit at
    Euclidean distance d ≤ R is certified globally nearest (anything outside
    the Chebyshev-R window is farther than R). O(K·R²) — on the common
    "refinement punched a few holes" images this replaces an O(h·w)
    full-image transform that dominated the 10k×10k wall time.

    Returns (dist2, nearest_row, nearest_col) in the same contract as
    ``edt_with_indices`` (valid cells map to themselves at 0), or None when
    the full transform is the better tool (dense/deep invalid regions).
    """
    h, w = mask.shape
    inv_r, inv_c = np.nonzero(mask)
    k = len(inv_r)
    if k == 0 or not (~mask).any():
        return None

    dist2 = np.zeros((h, w), dtype=np.float64)
    rows = np.arange(h, dtype=np.int64)[:, None]
    cols = np.arange(w, dtype=np.int64)[None, :]
    nr = np.broadcast_to(rows, (h, w)).copy()
    nc = np.broadcast_to(cols, (h, w)).copy()

    qr, qc = inv_r, inv_c
    radius = 2
    while len(qr):
        if len(qr) * (2 * radius + 1) ** 2 > 4 * h * w:
            return None  # window search would cost more than the full EDT
        d = np.arange(-radius, radius + 1, dtype=np.int64)
        rr = np.clip(qr[:, None] + d[None, :], 0, h - 1)  # (k, 2R+1)
        cc = np.clip(qc[:, None] + d[None, :], 0, w - 1)
        # candidate block per query: (k, 2R+1, 2R+1)
        cand_valid = ~mask[rr[:, :, None], cc[:, None, :]]
        dr = rr - qr[:, None]
        dc = cc - qc[:, None]
        d2 = dr[:, :, None].astype(np.float64) ** 2 + dc[:, None, :].astype(np.float64) ** 2
        d2[~cand_valid] = np.inf
        flat = d2.reshape(len(qr), -1)
        best = np.argmin(flat, axis=1)
        bestd2 = flat[np.arange(len(qr)), best]
        ok = bestd2 <= float(radius * radius)  # certified: nothing outside beats it
        bi, bj = np.divmod(best[ok], 2 * radius + 1)
        sel_r, sel_c = qr[ok], qc[ok]
        dist2[sel_r, sel_c] = bestd2[ok]
        nr[sel_r, sel_c] = rr[ok, bi]
        nc[sel_r, sel_c] = cc[ok][np.arange(ok.sum()), bj]
        qr, qc = qr[~ok], qc[~ok]
        radius *= 2
    return dist2, nr, nc


def nearest_valid(mask: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Dispatcher: sparse windowed search when invalid cells are few/shallow,
    full vectorized-FH transform otherwise. Identical contract either way."""
    mask = np.asarray(mask, dtype=bool)
    if mask.sum() * 25 <= mask.size:  # ≤4% invalid: try the sparse path first
        out = nearest_valid_sparse(mask)
        if out is not None:
            return out
    return edt_with_indices(mask)


def fill_nearest(values: np.ndarray, invalid_mask: np.ndarray) -> np.ndarray:
    """Replace invalid cells with the value of their nearest valid cell.

    Mirrors the reference's ``a[tuple(distance_transform_edt(...)[1])]`` gather
    (algorithm.py:311-314, 330-335).
    """
    if not invalid_mask.any():
        return values.copy()
    _, nr, nc = nearest_valid(invalid_mask)
    return values[nr, nc]
