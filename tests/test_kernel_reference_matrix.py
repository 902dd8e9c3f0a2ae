"""The reference's full Test0-Test14 matrix re-expressed over the kernel
(SURVEY.md §5): every scan distribution, wide rows, heavy filter, the
tiny-cardinality ladder (Tasks.txt:12-14), with the witness oracle
(count / parity / sortedness) + randomized cross-check vs sorted()."""

import numpy as np
import pandas as pd
import pytest

from external_merge_sort_loser_tree_ovc_spark.sources.fixtures import kernel_frame
from tests.test_kernel_external_sort import assert_sorted, parity, run_sort

# (name, scan_type, I, M, p, cols, domain, filter_expr)
MATRIX = [
    ("t6_ascending", 4, 40000, 2000, 400, 4, 100000, None),
    ("t7_descending", 5, 40000, 2000, 400, 4, 100000, None),
    ("t8_heavy_filter", 0, 40000, 2000, 400, 4, 10, lambda df: df[df.c0 > 8]),
    ("t9_zeros", 6, 40000, 2000, 400, 4, 10, None),
    ("t10_negative", 7, 40000, 2000, 400, 4, 10, lambda df: df[df.c0 < 1]),
    ("t11_wide", 0, 20000, 1000, 200, 70, 7, None),
    ("t12_dup_rows", 1, 40000, 2000, 400, 4, 10, None),
    ("t13_dup_cols", 2, 40000, 2000, 400, 4, 10, None),
    ("t14_all_dup", 3, 40000, 2000, 400, 4, 10, None),
]


@pytest.mark.parametrize("name,scan,i,m,p,c,d,filt", MATRIX, ids=[m[0] for m in MATRIX])
def test_reference_matrix(tmp_path, name, scan, i, m, p, c, d, filt):
    frame = kernel_frame(i, cols=c, domain=d, scan_type=scan, seed=13)
    if filt is not None:
        frame = filt(frame).reset_index(drop=True)
    keys = list(frame.columns)
    out, metrics = run_sort(tmp_path, frame, keys, m, p)
    # witness invariants (Witness.cpp:39-63)
    assert len(out) == len(frame)
    assert parity(out) == parity(frame)
    assert_sorted(out, keys)
    # full content check vs numpy lexsort oracle
    if len(frame):
        mat = frame.to_numpy()
        order = np.lexsort(tuple(mat[:, j] for j in range(mat.shape[1] - 1, -1, -1)))
        assert (out.to_numpy() == mat[order]).all()
    assert metrics.as_dict()["rows_in"] == len(frame)
    assert metrics.as_dict()["rows_out"] == len(frame)


@pytest.mark.parametrize("n", [0, 1, 2, 3, 7, 10, 29, 100, 576, 1000, 10000])
def test_tiny_cardinality_ladder(tmp_path, n):
    frame = kernel_frame(n, cols=4, domain=7, scan_type=0, seed=n + 1)
    out, metrics = run_sort(tmp_path, frame, list(frame.columns), 64, 16)
    assert len(out) == n
    assert parity(out) == parity(frame)
    assert_sorted(out, list(frame.columns))


@pytest.mark.parametrize("mode", ["fast", "exact"])
def test_duplicates_stability_modes(tmp_path, mode):
    """OVC tie path under total duplication (Tests 12-14 risk): equal
    rows must survive count+parity in both merge modes."""
    frame = kernel_frame(5000, cols=4, domain=3, scan_type=1, seed=3)
    out, metrics = run_sort(tmp_path, frame, list(frame.columns), 256, 64, mode=mode)
    assert len(out) == 5000
    assert parity(out) == parity(frame)
    if mode == "exact":
        assert metrics.as_dict()["ovc_compares"] > 0
