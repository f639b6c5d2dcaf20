"""Plan-string audit helpers.

Plan-shape tests (tests/test_plans.py, tests/test_rank_ops.py) assert on
`executedPlan().toString()` with naive substring counts. That breaks the
moment a plan contains a *materialized* cached relation: once an
InMemoryRelation's child AdaptiveSparkPlan has executed, its toString
prints BOTH an ``== Final Plan ==`` and an ``== Initial Plan ==`` section,
so every operator inside the cached subtree is counted twice — the pin
fails order-dependently depending on whether an earlier test already
materialized the shared frame (VERDICT r10 #1: the single permitted
BroadcastNestedLoopJoin in operators/pairhist.py counted as 2).

`strip_initial_plans` removes each ``== Initial Plan ==`` section —
the marker line plus every following line that is indented deeper than
the marker's branch glyph — leaving exactly one copy (the final plan)
of every node. Count-based pins must go through `final_plan(df)`.
"""

from __future__ import annotations

_MARKER = "== Initial Plan =="


def _branch_col(line: str) -> int:
    """Column of the line's tree-branch glyph (`+-` or `:-`).

    Spark's treeString draws children with `+- Node` / `:- Node` branch
    tokens; guide colons at earlier columns are continuation bars, so the
    *first* branch token marks the node's depth. Lines without a branch
    token (the root line, section bodies' wrapped output) get their first
    non-space column, which orders correctly against branch glyphs.
    """
    cands = [i for i in (line.find("+-"), line.find(":-")) if i >= 0]
    if cands:
        return min(cands)
    stripped = len(line) - len(line.lstrip(" :|"))
    return stripped


def strip_initial_plans(plan: str) -> str:
    """Drop every ``== Initial Plan ==`` section from an AQE plan string.

    A section spans its marker line and all subsequent lines whose branch
    glyph sits strictly deeper than the marker's — i.e. the subtree that
    Spark printed under the marker. Lines at or above the marker's depth
    (siblings/uncles of the cached relation) are kept, so nested cached
    relations and outer-plan continuation both survive.
    """
    lines = plan.splitlines()
    out: list[str] = []
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        if _MARKER not in line:
            out.append(line)
            i += 1
            continue
        depth = _branch_col(line)
        i += 1
        while i < n and (not lines[i].strip() or _branch_col(lines[i]) > depth):
            i += 1
    return "\n".join(out)


def final_plan(df) -> str:
    """Executed-plan string with every Initial-Plan section removed —
    safe for substring-count pins even when the plan embeds a
    materialized cached relation (shared pairhist / token-index frames).
    """
    return strip_initial_plans(
        df._jdf.queryExecution().executedPlan().toString()
    )
