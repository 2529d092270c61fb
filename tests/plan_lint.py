"""Physical-plan linter: structural scale rules applied to EVERY registered
query (VERDICT r5 task 3).

The plan string prints as an indented tree (`+- ` / `:- ` markers, 3 columns
per level). ``parse_tree`` recovers (depth, operator-line) pairs;
``lint_plan`` walks the tree and reports violations of the rules every plan
must satisfy regardless of which wave added it:

  R1  no CartesianProduct, ever (a broadcast scalar join plans as
      BroadcastNestedLoopJoin with a 1-row side, never CartesianProduct);
  R2  no SCAN-SCALE single-partition exchange: an ``Exchange
      SinglePartition`` is only legal when every path from it down to a
      FileScan passes through a bounding operator first (an aggregate, a
      limit, a TakeOrdered, or a broadcast build side) — i.e. the data
      entering the single partition is post-collapse, constant-bounded
      cardinality, not the corpus;
  R3  shuffle budget: at most MAX_EXCHANGES data exchanges
      (hash/range/single-partition) per plan — a wave that composes its way
      past that has a stage-graph problem a driver would feel at 100 TB.
  R5  (r9, VERDICT r8 item 7) explode-of-SOURCE-column pruning: the session
      excludes InferFiltersFromGenerate (it inlines computed-array HOF
      expressions into synthesized filters — the r8 double-eval fix), which
      also suppresses the `isnotnull(arr)` the rule would have pushed to the
      parquet scan when the exploded array is a DIRECT scan column. Every
      Generate over a bare scan-column attribute must therefore see an
      explicit IsNotNull(col) in that scan's PushedFilters (io.py's
      ingestion guards provide it for embeddings) — machine-proof that the
      exclusion is row-pruning-neutral across the registry.

Per-key exemptions live in tests/test_plan_lint.py WITH one-line
justifications; this module is policy-free parsing + rules.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class Node:
    depth: int
    text: str
    children: list = field(default_factory=list)

    @property
    def op(self) -> str:
        m = re.match(r"[*\(\)0-9]*\s*([A-Za-z][A-Za-z0-9_.]*)", self.text)
        return m.group(1) if m else self.text[:40]


_MARKER = re.compile(r"^(?P<indent>[:\s+|-]*)(?:\+- |:- )(?P<text>.*)$")


def parse_tree(plan: str) -> Node | None:
    """Parse Spark's plan-tree string into a Node tree.

    Depth = marker column / 3 (Spark indents 3 cols per level). Lines that
    are expression continuations (no `+- `/`:- ` marker) are ignored.
    WholeStageCodegen star prefixes (`*(3) `) stay inside ``text``.
    """
    lines = [ln for ln in plan.split("\n") if ln.strip()]
    if not lines:
        return None
    root = Node(depth=-1, text=lines[0].strip())
    stack = [root]
    for ln in lines[1:]:
        m = _MARKER.match(ln)
        if not m:
            continue
        depth = len(m.group("indent")) // 3
        node = Node(depth=depth, text=m.group("text").strip())
        while stack and stack[-1].depth >= depth:
            stack.pop()
        (stack[-1] if stack else root).children.append(node)
        stack.append(node)
    return root


# Operators that BOUND the cardinality flowing up from beneath them: any
# keyed/global aggregate (output = |groups|), explicit limits/top-k, and
# broadcast builds (capped by the broadcast threshold by construction).
_BOUNDING = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "TakeOrderedAndProject",
    "CollectLimit",
    "GlobalLimit",
    "LocalLimit",
    "BroadcastExchange",
    "BroadcastQueryStage",
    "AggregateInPandas",
    "FlatMapGroupsInPandas",  # group-collapsing Arrow aggregates
)

# (LocalTableScan / Range / OneRowRelation leaves are bounded implicitly:
# they are not FileScans, so _scan_reachable_unbounded never fires on them.)


def _scan_reachable_unbounded(node: Node) -> bool:
    """True iff some FileScan is reachable from ``node`` without passing
    through a bounding operator."""
    if node.op.startswith(_BOUNDING):
        return False
    if node.op.startswith("FileScan"):
        return True
    return any(_scan_reachable_unbounded(c) for c in node.children)


def _walk(node: Node):
    yield node
    for c in node.children:
        yield from _walk(c)


MAX_EXCHANGES = 8


# R5: `Generate explode(col#12)` / posexplode over a BARE attribute. A
# computed array (explode(transform(...)), explode(split(...))) is out of
# scope: its synthesized filter could never reach the scan anyway, so the
# rule exclusion is pruning-neutral there by construction.
_GENERATE_BARE_RE = re.compile(
    r"Generate (?:pos)?explode(?:_outer)?\(([A-Za-z_][A-Za-z0-9_]*)#\d+\)"
)
_PUSHED_RE = re.compile(r"PushedFilters: \[([^\]]*)\]")


def _scan_columns(text: str) -> set[str]:
    """Column base names a FileScan outputs (the bracketed list after
    'FileScan parquet')."""
    m = re.search(r"FileScan[^\[]*\[([^\]]*)\]", text)
    return set(_BASENAME_RE.findall(m.group(1))) if m else set()


def _r5_check(node: Node) -> list[str]:
    """For a Generate over a bare attribute, find FileScans beneath that
    output the attribute; each must push IsNotNull(attr)."""
    m = _GENERATE_BARE_RE.search(node.text)
    if not m:
        return []
    col = m.group(1)
    out: list[str] = []
    for n in _walk(node):
        if not n.op.startswith("FileScan"):
            continue
        if col not in _scan_columns(n.text):
            continue
        pm = _PUSHED_RE.search(n.text)
        pushed = pm.group(1) if pm else ""
        if f"IsNotNull({col})" not in pushed:
            out.append(f"R5:unpruned-explode-of-scan-column={col}")
    return out


_KEYS_RE = re.compile(r"keys=\[([^\]]*)\]")
# strip '#123L' exprId suffixes and cast/alias wrappers to the base name
_BASENAME_RE = re.compile(r"([A-Za-z_][A-Za-z0-9_]*)#\d+")


def _window_is_unpartitioned(text: str) -> bool:
    """True iff a Window node's spec has NO partition columns.

    windowspecdefinition prints partition columns first (bare refs), then
    order specs (carrying ASC/DESC): an unpartitioned window's first
    argument is already an order spec.
    """
    m = re.search(r"windowspecdefinition\((.*?)specifiedwindowframe", text)
    if not m:
        return False
    first = m.group(1).split(",")[0]
    return " ASC" in first or " DESC" in first


def _nearest_agg_keys(node: Node) -> list[str] | None:
    """Grouping-key base names of the nearest bounding aggregates on every
    path under ``node``, or None if any FileScan is reachable without
    passing a bounding operator first (the unsafe case)."""
    safe = True
    keys: set[str] = set()

    def visit(n: Node) -> None:
        nonlocal safe
        if n.op.startswith(("HashAggregate", "SortAggregate",
                            "ObjectHashAggregate")):
            m = _KEYS_RE.search(n.text)
            keys.update(_BASENAME_RE.findall(m.group(1) if m else ""))
            return  # bounded: stop descending this path
        if n.op.startswith(_BOUNDING):  # limit/broadcast: bounded, keyless
            return
        if n.op.startswith("FileScan"):
            safe = False
            return
        for c in n.children:
            visit(c)

    for c in node.children:
        visit(c)
    return sorted(keys) if safe else None


def lint_plan(plan: str) -> list[str]:
    """Return a list of violation strings (empty = clean)."""
    root = parse_tree(plan)
    if root is None:
        return []
    violations: list[str] = []
    n_exchanges = 0
    for node in _walk(root):
        if node.op == "CartesianProduct":
            violations.append("R1:CartesianProduct")
        if node.op == "Exchange":
            if "SinglePartition" in node.text:
                n_exchanges += 1
                if any(_scan_reachable_unbounded(c) for c in node.children):
                    violations.append("R2:scan-scale-single-partition-exchange")
            elif "hashpartitioning" in node.text or "rangepartitioning" in node.text:
                n_exchanges += 1
            # round-robin re-spreads are free repartitions, not data shuffles
        if node.op == "Generate":
            violations.extend(_r5_check(node))
        if node.op == "Window" and _window_is_unpartitioned(node.text):
            # R4 (r8, VERDICT r7 item 5): an UNPARTITIONED window is only
            # scale-safe when its input collapsed to a bounded grain first
            # (the W34/W38 sweep-line family: day-level relations). Report
            # the nearest bounding aggregate's grouping keys so the policy
            # layer (tests/test_plan_lint.py) can assert they are calendar/
            # level grains — "bounded by construction", machine-checked.
            keys = _nearest_agg_keys(node)
            if keys is None:
                violations.append("R4:global-window-over-scan")
            else:
                violations.append(
                    "R4:global-window-agg-keys=" + ",".join(sorted(keys))
                )
    if n_exchanges > MAX_EXCHANGES:
        violations.append(f"R3:exchanges={n_exchanges}")
    return violations
