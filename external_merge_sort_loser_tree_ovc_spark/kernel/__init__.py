from .external_sort import ExternalSorter, SortMetrics, sort_partition
from .loser_tree import LoserTreeMerge, run_relative_ovc
from .ovc import compare_ovc, run_ovc_codes, update_loser_ovc
from .planner import initial_fan_in, merge_depth, plan_merge
from .runs import RunInfo, RunStore

__all__ = [
    "ExternalSorter",
    "SortMetrics",
    "sort_partition",
    "LoserTreeMerge",
    "run_relative_ovc",
    "compare_ovc",
    "run_ovc_codes",
    "update_loser_ovc",
    "initial_fan_in",
    "merge_depth",
    "plan_merge",
    "RunInfo",
    "RunStore",
]
