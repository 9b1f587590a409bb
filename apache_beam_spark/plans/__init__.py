"""Physical-plan inspection & scale tooling.

The reference had no optimizer to inspect (SURVEY.md §4 — its only
"plans" were runner graph surgeries).  Here Catalyst is the optimizer,
so engine quality = plan quality; this package makes plan properties
assertable so they are *tested*, not hoped for: filters reach the
parquet scan, projections prune columns, small dims broadcast, hot
paths stay inside whole-stage codegen.
"""

from apache_beam_spark.plans.inspect import (
    broadcast_join_count,
    cache_candidates,
    plan_string,
    pushed_filters,
    scan_columns,
    shuffle_count,
    wholestage_codegen_ids,
)

__all__ = [
    "plan_string", "pushed_filters", "scan_columns", "shuffle_count",
    "broadcast_join_count", "wholestage_codegen_ids", "cache_candidates",
]
