"""Motion-vocabulary plan explainer (SURVEY.md §2.8).

The reference's EXPLAIN prints its MPP data movement as Motion nodes:
``Gather Motion N:1``, ``Redistribute Motion N:N (hash key)``,
``Broadcast Motion N:N`` (enum src/include/nodes/plannodes.h:1280-1284,
executor src/backend/executor/nodeMotion.c:171), and slices the plan at
each Motion (cdbllize.c:132). Spark's exact equivalents are Exchange
operators, and stages are its slices.

``explain_motion(df)`` renders a Spark physical plan with each exchange
annotated in Motion vocabulary — both a migration aid (plans read like
the reference's EXPLAIN) and a scale-review tool: every Motion line is a
full shuffle or broadcast of that subtree's output, which is exactly
what to count when asking "does this survive 100 TB?".
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class Motion:
    kind: str  # 'redistribute' | 'broadcast' | 'gather' | 'roundrobin'
    detail: str


_HASH_RE = re.compile(r"Exchange hashpartitioning\(([^)]*)\)")
_SINGLE_RE = re.compile(r"Exchange SinglePartition")
_RANGE_RE = re.compile(r"Exchange rangepartitioning\(([^)]*)\)")
_RR_RE = re.compile(r"Exchange RoundRobinPartitioning\((\d+)\)")
_BCAST_RE = re.compile(r"BroadcastExchange")


def _classify(line: str) -> Motion | None:
    m = _HASH_RE.search(line)
    if m:
        keys = ",".join(
            k.strip().split("#")[0] for k in m.group(1).split(",")[:-1]
        )
        return Motion("redistribute", f"Redistribute Motion N:N (hash: {keys})")
    if _SINGLE_RE.search(line):
        return Motion("gather", "Gather Motion N:1")
    m = _RANGE_RE.search(line)
    if m:
        keys = ",".join(
            k.strip().split("#")[0].split(" ")[0]
            for k in m.group(1).split(",")[:-1]
        )
        return Motion("redistribute", f"Merge-Gather Motion (range: {keys})")
    m = _RR_RE.search(line)
    if m:
        return Motion("roundrobin", f"Redistribute Motion N:N (round robin x{m.group(1)})")
    if _BCAST_RE.search(line):
        return Motion("broadcast", "Broadcast Motion N:N")
    return None


def explain_motion(df: DataFrame) -> str:
    """The physical plan with exchanges annotated as Motions and a slice
    count (stages = slices, cut at each shuffle like cdbllize.c)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = []
    n_shuffle = n_bcast = 0
    for line in plan.splitlines():
        motion = _classify(line)
        if motion:
            if motion.kind == "broadcast":
                n_bcast += 1
            else:
                n_shuffle += 1
            indent = len(line) - len(line.lstrip())
            out.append(" " * indent + f">> {motion.detail}")
        out.append(line)
    header = (
        f"-- slices: {n_shuffle + 1} (cut at each redistribute/gather), "
        f"broadcasts: {n_bcast}\n"
    )
    return header + "\n".join(out)


def motion_summary(df: DataFrame) -> dict[str, int]:
    """Counts of each motion kind in the plan — the scale-review scorecard
    (fewer redistributes of the fact side = better)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    counts = {"redistribute": 0, "broadcast": 0, "gather": 0, "roundrobin": 0}
    for line in plan.splitlines():
        m = _classify(line)
        if m:
            counts[m.kind] += 1
    return counts
