#!/usr/bin/env python3
"""Split an oversized query module into shared-helpers + query chunks
(VERDICT r5 task 6) with byte-identical registration semantics.

Approach: slice the ORIGINAL SOURCE by top-level statement line ranges (so
comments, formatting, and docstrings survive verbatim — no ast.unparse
round-trip), classify each segment as import / helper (constants +
unregistered defs) / registered query, then emit:

  <stem>_shared.py   module docstring + imports + every helper, in order
  <stem>_pNN.py      imports + explicit `from .<stem>_shared import (...)`
                     of exactly the helper names that chunk references +
                     its query segments, in original order

Chunk boundaries respect a line budget. Registration ORDER is preserved by
importing the chunks in sequence from queries/__init__.py (the caller
updates that). Verification is the caller's job: snapshot
{key: (oracle, section)} before, compare after.

Usage: python tools/split_module.py ai_to_cvent_etl_spark/queries/aggregates.py --budget 4600
"""

from __future__ import annotations

import argparse
import ast
import os


def split(path: str, budget: int) -> list[str]:
    src = open(path).read()
    lines = src.split("\n")
    tree = ast.parse(src)
    stem = os.path.splitext(os.path.basename(path))[0]
    pkg_dir = os.path.dirname(path)

    segments = []  # (kind, name, text)
    prev_end = 0
    docstring = None
    for node in tree.body:
        start = min(
            [node.lineno]
            + [d.lineno for d in getattr(node, "decorator_list", [])]
        )
        # attach the preceding gap (comments/blanks) to this segment
        seg_text = "\n".join(lines[prev_end:node.end_lineno])
        prev_end = node.end_lineno
        if isinstance(node, ast.Expr) and docstring is None and not segments:
            docstring = seg_text
            continue
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            kind, name = "import", None
        elif isinstance(node, ast.FunctionDef) and any(
            isinstance(d, ast.Call) and getattr(d.func, "id", "") == "register"
            for d in node.decorator_list
        ):
            kind, name = "query", node.name
        elif isinstance(node, (ast.FunctionDef, ast.ClassDef)):
            kind, name = "helper", node.name
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            tgt = node.targets[0] if isinstance(node, ast.Assign) else node.target
            if isinstance(tgt, ast.Tuple):  # e.g. A, B = 1, 2
                name = tuple(getattr(e, "id", "?") for e in tgt.elts)
            else:
                name = getattr(tgt, "id", None)
            kind = "helper"
        else:
            raise SystemExit(f"unhandled top-level node at {path}:{node.lineno}")
        segments.append((kind, name, seg_text, node))

    imports = [s for s in segments if s[0] == "import"]
    helpers = [s for s in segments if s[0] == "helper"]
    queries = [s for s in segments if s[0] == "query"]
    helper_names: set[str] = set()
    n_names = 0
    for s in helpers:
        ns = s[1] if isinstance(s[1], tuple) else (s[1],)
        helper_names.update(ns)
        n_names += len(ns)
    assert len(helper_names) == n_names, "duplicate helper names"

    import_text = "\n".join(s[2].strip("\n") for s in imports)

    # shared module
    shared_name = f"{stem}_shared"
    shared_path = os.path.join(pkg_dir, f"{shared_name}.py")
    with open(shared_path, "w") as f:
        f.write(docstring or '"""Shared helpers."""')
        f.write(
            f"\n\n# Shared constants/helpers split out of {stem}.py (r6: no"
            "\n# source file over the 5k-line readability budget); query"
            "\n# chunks import exactly what they reference.\n\n"
        )
        f.write(import_text + "\n")
        for _, _, text, _ in helpers:
            f.write("\n" + text.strip("\n") + "\n")

    # chunk the queries by line budget
    chunks: list[list[tuple]] = [[]]
    count = 0
    for seg in queries:
        n = seg[2].count("\n") + 1
        if count + n > budget and chunks[-1]:
            chunks.append([])
            count = 0
        chunks[-1].append(seg)
        count += n

    out_paths = [shared_path]
    pkg = pkg_dir.replace("/", ".").strip(".")
    for ci, chunk in enumerate(chunks, 1):
        used = set()
        for _, _, _, node in chunk:
            for n in ast.walk(node):
                if isinstance(n, ast.Name) and n.id in helper_names:
                    used.add(n.id)
        cpath = os.path.join(pkg_dir, f"{stem}_p{ci:02d}.py")
        first_k, last_k = chunk[0][1], chunk[-1][1]
        with open(cpath, "w") as f:
            f.write(
                f'"""Registered queries {first_k}..{last_k} (chunk {ci} of '
                f'{len(chunks)} split from {stem}.py — see '
                f'{shared_name}.py for shared helpers)."""\n\n'
            )
            f.write(import_text + "\n")
            if used:
                names = ",\n    ".join(sorted(used))
                f.write(
                    f"\nfrom {pkg}.{shared_name} import (  # noqa: F401\n"
                    f"    {names},\n)\n"
                )
            for _, _, text, _ in chunk:
                f.write("\n" + text.strip("\n") + "\n")
        out_paths.append(cpath)
    return out_paths


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--budget", type=int, default=4600)
    args = ap.parse_args()
    for p in split(args.path, args.budget):
        print(p)
