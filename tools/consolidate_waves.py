#!/usr/bin/env python3
"""Fold the 44 small wave modules (analytics_r3b..r4s) into the family
modules (r3 VERDICT task 6) without touching keys, oracles, or function
bodies.

Method (AST, no hand-editing):
  * Each wave file is parsed into ordered top-level nodes: imports,
    helpers (assignments / private defs), and registered ``q_*``
    functions. Source segments are taken by LINE SPAN, extended backward
    over contiguous comment lines so section banners and cache-contract
    comments travel with their node.
  * Every ``q_*`` function carries a ``section="A53"``-style literal in
    its @register call; the LETTER prefix maps to the owning family
    module (A->aggregates, W->windows, E->etl, TS->timeseries, ...).
  * Each function's helper needs are the transitive closure of bare-name
    references (AST Name nodes, decorator f-string oracles included)
    over same-file module-level helpers. Helpers are emitted into every
    target that needs them; identical duplicate definitions are deduped,
    DIFFERING duplicates (vs another wave or vs the target module's own
    globals) abort the run — nothing is silently renamed.
  * Late imports of the shared graph infra
    (``queries.analytics_r3b import _EDGE_CTES`` etc.) are rewritten
    textually to ``queries.graph`` — the infra's only bare-name users
    are G-section functions, so the closure lands it in graph.py.
  * Wave module docstrings (per-key determinism/scale notes) are
    preserved verbatim in WAVE_NOTES.md; the @register ``doc=`` strings
    already carry the per-query substance in-code.

Validation is external: the registry key set must be unchanged and the
full sf0.01 selfcheck must reproduce CORRECTNESS_SELF.json statuses.

Usage: python tools/consolidate_waves.py [--apply]   (default: dry run)
"""

from __future__ import annotations

import argparse
import ast
import glob
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QDIR = os.path.join(REPO, "ai_to_cvent_etl_spark", "queries")

SECTION_TARGET = {
    "A": "aggregates",
    "W": "windows",
    "O": "windows",
    "E": "etl",
    "TS": "timeseries",
    "G": "graph",
    "T": "text",
    "L": "llm_text",
    "J": "joins",
    "F": "functions",
    "U": "setops",
    "SK": "sketches",
    "D": "dedup_scale",
    "V": "vectors",
    "X": "udfs",
    "S": "scans",
    "ST": "streaming_batch",
    "M": "multimodal",
    "P": "filters",
}

R3B_REWRITE = (
    "ai_to_cvent_etl_spark.queries.analytics_r3b",
    "ai_to_cvent_etl_spark.queries.graph",
)


def wave_files() -> list[str]:
    return sorted(
        glob.glob(os.path.join(QDIR, "analytics_r3[b-z].py"))
        + glob.glob(os.path.join(QDIR, "analytics_r4[a-s].py"))
    )


def node_span(src_lines: list[str], node: ast.stmt) -> tuple[int, int]:
    """1-based inclusive line span, decorators included, extended backward
    over contiguous comment/blank-comment lines directly above."""
    start = node.lineno
    if getattr(node, "decorator_list", None):
        start = min(d.lineno for d in node.decorator_list)
    # pull in the comment block immediately above (no blank line between
    # comment block and node; blank lines inside the comment run are kept)
    i = start - 2  # index of the line above, 0-based
    while i >= 0 and src_lines[i].lstrip().startswith("#"):
        i -= 1
    pulled = i + 2 if (i + 2) < start else start
    return pulled, node.end_lineno


def names_loaded(node: ast.AST) -> set[str]:
    out = set()
    for n in ast.walk(node):
        if isinstance(n, ast.Name):
            out.add(n.id)
    return out


def assigned_names(node: ast.stmt) -> list[str]:
    if isinstance(node, ast.Assign):
        return [t.id for t in node.targets if isinstance(t, ast.Name)]
    if isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
        return [node.target.id]
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
        return [node.name]
    return []


def section_of(node: ast.FunctionDef) -> str | None:
    for dec in node.decorator_list:
        if isinstance(dec, ast.Call):
            for kw in dec.keywords:
                if kw.arg == "section" and isinstance(kw.value, ast.Constant):
                    return kw.value.value
    return None


def target_of(section: str) -> str:
    m = re.match(r"[A-Z]+", section)
    assert m, section
    prefix = m.group(0)
    # longest-prefix match (TS before T, SK before S, ST before S)
    for p in sorted(SECTION_TARGET, key=len, reverse=True):
        if prefix == p or (prefix.startswith(p) and p in ("TS", "SK", "ST")):
            if prefix == p:
                return SECTION_TARGET[p]
    if prefix in SECTION_TARGET:
        return SECTION_TARGET[prefix]
    raise SystemExit(f"unmapped section prefix: {section}")


def norm_import(line: str) -> str:
    return re.sub(r"\s+", " ", line.strip())


def sem_dump(src: str) -> str:
    """AST dump with comments and function docstrings stripped — two
    definitions compare equal iff they execute identically."""
    tree = ast.parse(re.sub(r"^#.*\n", "", src, flags=re.M) if src else "pass")
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and (
            node.body
            and isinstance(node.body[0], ast.Expr)
            and isinstance(node.body[0].value, ast.Constant)
            and isinstance(node.body[0].value.value, str)
        ):
            node.body = node.body[1:] or [ast.Pass()]
    return ast.dump(tree)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--apply", action="store_true")
    args = ap.parse_args()

    # what each target already defines / imports
    target_defs: dict[str, dict[str, str]] = {}
    target_imports: dict[str, set[str]] = {}
    for tgt in set(SECTION_TARGET.values()):
        path = os.path.join(QDIR, tgt + ".py")
        src = open(path).read()
        tree = ast.parse(src)
        defs = {}
        imps = set()
        for node in tree.body:
            for nm in assigned_names(node):
                defs[nm] = ast.get_source_segment(src, node) or ""
            if isinstance(node, (ast.Import, ast.ImportFrom)):
                imps.add(norm_import(ast.get_source_segment(src, node)))
        target_defs[tgt] = defs
        target_imports[tgt] = imps

    additions: dict[str, list[str]] = {t: [] for t in set(SECTION_TARGET.values())}
    new_imports: dict[str, list[str]] = {t: [] for t in additions}
    emitted: dict[str, dict[str, str]] = {t: {} for t in additions}
    docstrings: list[tuple[str, str]] = []
    problems: list[str] = []
    moved = 0

    for path in wave_files():
        base = os.path.basename(path)[: -len(".py")]
        src = open(path).read()
        src_lines = src.split("\n")
        tree = ast.parse(src)

        if (
            tree.body
            and isinstance(tree.body[0], ast.Expr)
            and isinstance(tree.body[0].value, ast.Constant)
            and isinstance(tree.body[0].value.value, str)
        ):
            docstrings.append((base, tree.body[0].value.value))

        helpers: dict[str, ast.stmt] = {}
        helper_order: list[str] = []
        qfuncs: list[ast.FunctionDef] = []
        imports: list[str] = []
        for node in tree.body:
            if isinstance(node, (ast.Import, ast.ImportFrom)):
                seg = ast.get_source_segment(src, node)
                if "from __future__" not in seg:
                    imports.append(seg)
                continue
            if isinstance(node, ast.FunctionDef) and node.name.startswith("q_"):
                qfuncs.append(node)
                continue
            nms = assigned_names(node)
            if nms:
                for nm in nms:
                    helpers[nm] = node
                    helper_order.append(nm)
            elif not (
                isinstance(node, ast.Expr)
                and isinstance(node.value, ast.Constant)
            ):
                problems.append(f"{base}: unclassified node at line {node.lineno}")

        # transitive helper closure per helper
        helper_deps: dict[str, set[str]] = {
            nm: names_loaded(helpers[nm]) & set(helpers) - {nm}
            for nm in helpers
        }

        def closure(seed: set[str]) -> list[str]:
            out: set[str] = set()
            stack = list(seed)
            while stack:
                nm = stack.pop()
                if nm in out:
                    continue
                out.add(nm)
                stack.extend(helper_deps[nm] - out)
            return [nm for nm in helper_order if nm in out]

        # group this file's functions by target, preserving order
        by_target: dict[str, list[ast.FunctionDef]] = {}
        for fn in qfuncs:
            sec = section_of(fn)
            if sec is None:
                problems.append(f"{base}.{fn.name}: no section literal")
                continue
            by_target.setdefault(target_of(sec), []).append(fn)

        for tgt, fns in by_target.items():
            need: list[str] = []
            for fn in fns:
                for nm in closure(names_loaded(fn) & set(helpers)):
                    if nm not in need:
                        need.append(nm)
            chunks = [f"\n\n# ==== from {base} " + "=" * max(1, 56 - len(base))]
            for nm in need:
                lo, hi = node_span(src_lines, helpers[nm])
                seg = "\n".join(src_lines[lo - 1 : hi])
                prev = emitted[tgt].get(nm) or target_defs[tgt].get(nm)
                if prev is not None:
                    if sem_dump(seg) != sem_dump(prev):
                        problems.append(
                            f"COLLISION {tgt}.{nm}: {base} definition differs"
                        )
                    continue  # identical — dedupe
                emitted[tgt][nm] = seg
                chunks.append("\n\n" + seg)
            for fn in fns:
                lo, hi = node_span(src_lines, fn)
                seg = "\n".join(src_lines[lo - 1 : hi])
                seg = seg.replace(*R3B_REWRITE)
                chunks.append("\n\n" + seg)
                moved += 1
            additions[tgt].append("".join(chunks))
            for imp in imports:
                if (
                    norm_import(imp) not in target_imports[tgt]
                    and imp not in new_imports[tgt]
                ):
                    new_imports[tgt].append(imp)

    print(f"{moved} functions over {len(wave_files())} wave files")
    for tgt in sorted(additions):
        if additions[tgt]:
            nfn = sum(c.count("\ndef q_") + c.count("\n\ndef q_") for c in additions[tgt])
            print(
                f"  -> {tgt}.py: +{len(additions[tgt])} wave blocks, "
                f"+{len(emitted[tgt])} helpers, +{len(new_imports[tgt])} imports"
            )
    if problems:
        print("PROBLEMS:")
        for p in problems:
            print("  " + p)
        sys.exit(1)
    if not args.apply:
        print("dry run OK — rerun with --apply")
        return

    # apply: append to targets (imports inserted after the last top-level
    # import), write WAVE_NOTES.md, delete wave files, rewrite __init__.py
    for tgt, blocks in additions.items():
        if not blocks:
            continue
        path = os.path.join(QDIR, tgt + ".py")
        src = open(path).read()
        if new_imports[tgt]:
            tree = ast.parse(src)
            last_imp = max(
                n.end_lineno
                for n in tree.body
                if isinstance(n, (ast.Import, ast.ImportFrom))
            )
            lines = src.split("\n")
            lines[last_imp:last_imp] = new_imports[tgt]
            src = "\n".join(lines)
        src = src.rstrip("\n") + "\n" + "".join(blocks).rstrip("\n") + "\n"
        open(path, "w").write(src)

    with open(os.path.join(REPO, "WAVE_NOTES.md"), "w") as fh:
        fh.write(
            "# WAVE NOTES — per-wave determinism/scale notes preserved from "
            "the consolidated wave modules (r4 task 6)\n\nThe 44 wave modules "
            "analytics_r3b..r4s were folded into the family modules; their "
            "module docstrings (per-key notes) are archived here verbatim. "
            "The @register doc= strings in-code remain the living "
            "documentation.\n"
        )
        for base, doc in docstrings:
            fh.write(f"\n## {base}\n\n```\n{doc.strip()}\n```\n")

    for path in wave_files():
        os.remove(path)

    init_path = os.path.join(QDIR, "__init__.py")
    init_src = open(init_path).read()
    init_src = re.sub(r"    analytics_r3[b-z],\n|    analytics_r4[a-s],\n", "", init_src)
    open(init_path, "w").write(init_src)
    print("applied")


if __name__ == "__main__":
    main()
