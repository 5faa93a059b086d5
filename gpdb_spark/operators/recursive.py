"""Recursive CTE — WITH RECURSIVE fixpoint iteration.

Reference: ExecRecursiveUnion (src/backend/executor/nodeRecursiveunion.c:76)
pulls the non-recursive seed, then repeatedly re-evaluates the recursive
term against the working table (nodeWorktablescan.c:86) until it produces
no rows. Spark (<4.0 SQL) has no native recursive CTE, so this is a
driver-side loop: the *control flow* runs on the driver (one `isEmpty()`
check per iteration) but every step's data stays distributed.

Scale notes:
- each iteration localCheckpoints the frontier to truncate the lineage —
  otherwise the plan doubles per iteration and planning time explodes;
- UNION (distinct) mode keeps only newly-discovered rows in the frontier
  (semi-anti join against the accumulated set), which is the standard
  distributed transitive-closure optimization;
- max_iterations guards against non-terminating recursion (the reference
  relies on the user's WHERE clause the same way).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def recursive_cte(
    seed: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_iterations: int = 100,
    distinct: bool = False,
) -> DataFrame:
    """Evaluate WITH RECURSIVE: seed UNION [ALL] step(seed) ... to fixpoint.

    ``distinct=False`` = UNION ALL semantics (append every iteration's
    output); ``distinct=True`` = UNION semantics (global dedup; iteration
    stops when no *new* rows appear).
    """
    # r11 (guide §5 "the driver should do almost no data work"): the loop
    # used to re-materialize the ENTIRE accumulated set every round
    # (acc.unionAll(nxt).localCheckpoint(eager)) — O(rounds²) row
    # materializations and 2 full jobs per round, so a 20-round series
    # spent ~50 s in driver-side round trips. The accumulator is now a
    # LIST of already-checkpointed frontiers: the only per-round job is
    # the frontier checkpoint (isEmpty on a checkpointed frame is a
    # 1-partition probe), and the final union is a FLAT plan over
    # checkpoint scan nodes — width max_iterations, depth 1, so analysis
    # cost stays linear and lineage still never compounds.
    frontier = seed.localCheckpoint(eager=True)
    frames = [frontier]
    for _ in range(max_iterations):
        nxt = step(frontier)
        if distinct:
            acc = frames[0]
            for f in frames[1:]:
                acc = acc.unionAll(f)
            nxt = nxt.distinct().exceptAll(acc.distinct())
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        frames.append(nxt)
        frontier = nxt
    else:
        raise RuntimeError(
            f"recursive_cte did not converge in {max_iterations} iterations"
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out.distinct() if distinct else out
