"""Offset-value coding (OVC) — scalar pair semantics + vectorized run codes.

The reference keeps OVC as a two-int pair ``(offset, offsetValue)`` per row
(reference ``Iterator.h:16-18``) with a non-standard convention
(reference ``TreeOfLosers.cpp:13-37``):

- higher ``offset`` sorts earlier,
- ties broken by lower ``offsetValue``,
- remaining ties fall back to comparing ``columns[offset+1:]`` and the
  number of column comparisons consumed is charged to the *loser*,
  whose pair becomes ``(offset+ct, columns[offset+ct])`` with an
  end-of-row clamp (reference ``TreeOfLosers.cpp:227-241, 324-360``),
- full equality returns True (stable wrt leaf order,
  reference ``TreeOfLosers.cpp:36``),
- a row's OVC is initialized to ``(0, columns[0])`` at generation
  (reference ``Scan.cpp:104-106``).

``compare_ovc`` reimplements exactly that contract (used by the exact
loser tree for metric parity).  ``run_ovc_codes`` is the *vectorized*
classic form used by the fast kernel: for each row of an already-sorted
run, a single packed ``uint64`` ``(arity - offset) << 32 | value-delta``
relative to its predecessor — the EDBT 2023 "Offset-value coding in
database query processing" formulation (see PAPERS.md), which turns most
merge comparisons into one integer compare.
"""

from __future__ import annotations

import numpy as np

INF = np.iinfo(np.int64).max
NEG_INF = np.iinfo(np.int64).min

# Fence ("positive fence") row marker: loses every comparison so it sinks
# to the end of a merge; mirrors the sentinel at reference DRAM.cpp:25-27
# and TreeOfLosers.cpp:164-166 (offset=INT_MIN, offsetValue=INT_MAX).
FENCE_OFFSET = NEG_INF
FENCE_VALUE = INF


def compare_ovc(cols_a, ovc_a, cols_b, ovc_b):
    """Compare two rows under the reference OVC contract.

    cols_a/cols_b : 1-D int sequences (full rows; the sort key is the
        whole row, like reference Witness/TreeOfLosers).
    ovc_a/ovc_b   : [offset, offset_value] mutable pairs.

    Returns (a_first: bool, ct: int) where ``a_first`` is True when row A
    sorts at-or-before row B (True on full equality), and ``ct`` is the
    number of column-value comparisons consumed.  The CALLER applies the
    loser's OVC update (the reference updates the loser at the tree node,
    not inside isLessThan).
    """
    if ovc_a[0] != ovc_b[0]:
        return ovc_a[0] > ovc_b[0], 0
    if ovc_a[1] != ovc_b[1]:
        return ovc_a[1] < ovc_b[1], 0
    ct = 0
    n = len(cols_a)
    for i in range(ovc_a[0] + 1, n):
        ct += 1
        if cols_a[i] != cols_b[i]:
            return cols_a[i] < cols_b[i], ct
    return True, ct


def update_loser_ovc(cols, ovc, ct):
    """Charge ``ct`` comparisons to the loser row's OVC pair.

    Mirrors reference ``TreeOfLosers.cpp:227-241`` including the
    out-of-bounds clamp to the last column.
    """
    if ct <= 0:
        return
    n = len(cols)
    off = ovc[0] + ct
    if off > n:
        ovc[0] = n
        ovc[1] = cols[n - 1]
    else:
        ovc[0] = off
        # NOTE: the reference indexes columns[offset] with offset possibly
        # == row_len only guarded by `> row_len`; offset == n would be OOB
        # in C++ but is unreachable because ct <= n-1-old_offset.
        ovc[1] = cols[off] if off < n else cols[n - 1]


def run_ovc_codes(key_mat: np.ndarray) -> np.ndarray:
    """Vectorized classic OVC codes for a SORTED run.

    key_mat : (n, k) uint64 normalized key matrix, already in sorted
        order.  Returns (n,) uint64 codes where code[i] encodes
        ``(k - offset_i) << 32 | low32(delta value at first diff)`` with
        offset_i = index of first column where row i differs from row
        i-1 (row 0 gets the max code: offset 0 against "-infinity").

    Within one sorted run, comparing two rows' codes decides their order
    whenever the codes differ; equal codes require a suffix compare.
    This gives the fast merge a single-int-compare fast path with the
    same effect as the reference's pairwise OVC maintenance.
    """
    n, k = key_mat.shape
    codes = np.zeros(n, dtype=np.uint64)
    if n == 0 or k == 0:
        return codes
    diff = key_mat[1:] != key_mat[:-1]  # (n-1, k)
    any_diff = diff.any(axis=1)
    first = np.where(any_diff, diff.argmax(axis=1), k)  # k => equal rows
    arity_minus_off = (k - first).astype(np.uint64)
    rows = np.arange(1, n)
    vals = np.where(
        first < k,
        key_mat[rows, np.minimum(first, k - 1)] & np.uint64(0xFFFFFFFF),
        np.uint64(0),
    )
    codes[1:] = (arity_minus_off << np.uint64(32)) | vals
    codes[0] = (np.uint64(k) << np.uint64(32)) | (key_mat[0, 0] & np.uint64(0xFFFFFFFF))
    return codes
