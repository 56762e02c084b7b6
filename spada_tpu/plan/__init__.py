from spada_tpu.plan.groups import GroupTracker, parse_group
from spada_tpu.plan.planner import ExecutionPlan, plan_spgemm, execute_plan

__all__ = [
    "GroupTracker",
    "parse_group",
    "ExecutionPlan",
    "plan_spgemm",
    "execute_plan",
]
