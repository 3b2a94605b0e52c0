from .dag import CycleError, Node, Pipeline
from .guards import (
    assert_filter_pushed,
    assert_no_full_scan,
    explain_string,
    pushed_filters,
    scan_file_count,
    wholestage_codegen_ids,
)

__all__ = [
    "CycleError",
    "Node",
    "Pipeline",
    "assert_filter_pushed",
    "assert_no_full_scan",
    "explain_string",
    "pushed_filters",
    "scan_file_count",
    "wholestage_codegen_ids",
]
