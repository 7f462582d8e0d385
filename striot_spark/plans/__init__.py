from striot_spark.plans.graph import (
    ExpandOp,
    FilterAccOp,
    FilterOp,
    MapOp,
    ScanOp,
    compile_fused,
    run_chain,
    run_fused,
)
from striot_spark.plans.lower import apply_chain
from striot_spark.plans.rewrite import DEFAULT_RULES, optimize, stateful_stages

__all__ = [
    "ExpandOp",
    "FilterAccOp",
    "FilterOp",
    "MapOp",
    "ScanOp",
    "compile_fused",
    "run_chain",
    "run_fused",
    "apply_chain",
    "optimize",
    "stateful_stages",
    "DEFAULT_RULES",
]
