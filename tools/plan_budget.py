"""Record per-query shuffle-exchange budgets (tests/plan_budgets.json).

Usage: python tools/plan_budget.py [sf_dir]

Counts the data-moving exchanges (hash / range / single-partition /
round-robin) in each registered query's physical plan at the smoke scale
factor and writes them as the budget `tests/test_plans.py::
test_shuffle_exchange_budgets` pins. Broadcast and reused exchanges are
NOT counted — broadcasts are dimension-sized by design and reuse moves
nothing. Re-run after intentionally changing a plan's shuffle count.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

_SHUFFLE = re.compile(
    r"Exchange (hashpartitioning|rangepartitioning|SinglePartition"
    r"|RoundRobinPartitioning)"
)


def count_shuffles(plan: str) -> int:
    return len(_SHUFFLE.findall(plan))


def main() -> None:
    from endtoend_etl_openmeteo_spark import plans
    from endtoend_etl_openmeteo_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    registry = plans.load_all()
    spark = get_spark("plan-budget")
    budgets = {}
    for name, spec in registry.items():
        plan = spec.fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        budgets[name] = count_shuffles(plan)
        print(f"{budgets[name]:3d}  {name}")
    out = REPO / "tests" / "plan_budgets.json"
    out.write_text(json.dumps(budgets, indent=1, sort_keys=True) + "\n")
    print(f"wrote {out} ({len(budgets)} budgets)")


if __name__ == "__main__":
    main()
