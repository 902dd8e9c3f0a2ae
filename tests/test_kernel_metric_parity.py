"""Numeric comparison-count parity: EXACT pinned metric values for
fixed seeded fixtures, not just `> 0` (VERDICT r01 gap #1).

Geometries mirror the reference's Test0/Test1 configurations
(BASELINE.md measured rows; reference Sort.cpp:85-100 printouts):

- Test1 geometry (I=2300, M=110, p=10): the reference measures W=23,
  B=10, X=5 — our kernel reproduces the SAME plan because it uses the
  same formulas (X = (W-2) % (B-1) + 2, Sort.cpp:85 / DRAM.cpp:460;
  depth = 1 + ceil(log_B W), Sort.cpp:88).
- Test0 geometry (I=40000, M=2000, p=400, ~70% filter).

Counts are deterministic: run formation, size-ascending merge order
(ties broken by run creation order — runs.py), and the loser-tree
replay are all seed-stable.  The pinned ovc/col compare totals are this
kernel's cost-model ground truth; structural bounds tie them to the
reference's claims (1 comparison per tree level per pop,
TreeOfLosers.cpp:291-366; spill <= passes * I, README.md:7-8).
"""

import math

import pandas as pd
import pytest

from external_merge_sort_loser_tree_ovc_spark.kernel.external_sort import ExternalSorter
from external_merge_sort_loser_tree_ovc_spark.sources.fixtures import kernel_frame


def _run_exact(tmp_path, frame, mem, batch):
    sorter = ExternalSorter(
        key_cols=list(frame.columns),
        spill_dir=str(tmp_path / "s"),
        memory_budget_rows=mem,
        batch_rows=batch,
        mode="exact",
    )
    chunks = [frame.iloc[i : i + batch] for i in range(0, len(frame), batch)]
    out = pd.concat(list(sorter.sort(iter(chunks))), ignore_index=True)
    return out, sorter.metrics.as_dict()


# (name, frame-builder, M, p, pinned metrics)
CASES = [
    (
        "test1_geometry",  # reference Test1: M=110, p=10, I=2300 -> W=23 B=10 X=5
        lambda: kernel_frame(2300, cols=4, domain=100, scan_type=0, seed=99),
        110,
        10,
        {
            "runs_formed": 23,       # == reference's measured W for this geometry
            "fan_in": 10,            # == reference's B
            "initial_fan_in": 5,     # X = (23-2) % 9 + 2  (Sort.cpp:85)
            "depth": 3,              # 1 + ceil(log_10 23)  (Sort.cpp:88)
            "passes": 3,
            "spill_rows": 3800,
            "ovc_compares": 6209,
            "col_compares": 804,
        },
    ),
    (
        "test0_geometry",  # reference Test0: M=2000, p=400, filtered I
        lambda: (
            lambda f: f[f.c0 > 2].reset_index(drop=True)
        )(kernel_frame(40000, cols=4, domain=10, scan_type=0, seed=13)),
        2000,
        400,
        {
            "runs_formed": 18,
            "fan_in": 4,
            "initial_fan_in": 3,     # X = (18-2) % 3 + 2
            "depth": 4,              # 1 + ceil(log_4 18) — 4 passes like ref Test0
            "passes": 4,
            "spill_rows": 65600,
            "ovc_compares": 55831,
            "col_compares": 2072,
        },
    ),
]


@pytest.mark.parametrize("name,mk,mem,batch,pinned", CASES, ids=[c[0] for c in CASES])
def test_pinned_metric_parity(tmp_path, name, mk, mem, batch, pinned):
    frame = mk()
    out, m = _run_exact(tmp_path, frame, mem, batch)
    assert len(out) == len(frame)
    for key, want in pinned.items():
        assert m[key] == want, f"{name}.{key}: {m[key]} != pinned {want}"

    # formula cross-checks (the reference's own arithmetic)
    w, b = m["runs_formed"], m["fan_in"]
    assert m["initial_fan_in"] == (w - 2) % (b - 1) + 2
    assert m["depth"] == 1 + math.ceil(math.log(w) / math.log(b))

    # reference cost-model bounds:
    # spill <= passes * I (README.md:7-8; ours is lower because the
    # final merge streams instead of writing a last run)
    assert m["spill_rows"] <= m["passes"] * len(frame)
    # loser tree: <= 1 comparison per tree level per pop
    # (TreeOfLosers.cpp:291-366); pops = I rows + <= B exhaustion fences,
    # final fan-in <= B so height = ceil(log2 B)
    assert m["ovc_compares"] <= (len(frame) + b) * math.ceil(math.log2(b))
    assert m["ovc_compares"] >= len(frame) - 1
    # OVC thesis: column compares are a small fraction of matches
    assert m["col_compares"] < m["ovc_compares"] / 5


def test_counts_are_run_to_run_deterministic(tmp_path):
    frame = kernel_frame(2300, cols=4, domain=100, scan_type=0, seed=99)
    _, m1 = _run_exact(tmp_path / "a", frame, 110, 10)
    _, m2 = _run_exact(tmp_path / "b", frame, 110, 10)
    for k in ("ovc_compares", "col_compares", "spill_rows", "passes"):
        assert m1[k] == m2[k]
