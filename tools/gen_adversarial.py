#!/usr/bin/env python3
"""Adversarial fixture generator (VERDICT r5 task 4).

The driver fixtures contain no NULLs, no empty tables, plain-ASCII text,
and benign key distributions (SURVEY §1.3), so the engine's
three-valued-logic and hostile-input behavior is only pinned where queries
manufacture NULLs themselves. This tool derives a HOSTILE variant of
sf0.001 that every registered query must survive (crash-freedom, not
value-correctness — the oracle contract still runs on the driver
fixtures):

  * NULL injection: every non-primary-key column (including FKs and
    timestamps) gets NULLs on a deterministic ~5% of rows
    (hash-selected, no RNG);
  * one EMPTY table: supplier (schema preserved, zero rows);
  * hostile text: a deterministic subset of documents.text becomes empty
    string, whitespace-only, single char, emoji/CJK/RTL/combining
    unicode, or a 10k-char single token; n_chars is NOT recomputed
    (metadata drift is part of the hostility);
  * 90%-skew keys: events.user_id collapses to one hot user on 90% of
    rows; lineitem.l_suppkey collapses to supplier 1 on 90% of rows;
  * embeddings: ~2% NULL vectors, ~2% empty arrays, ~2% vectors
    containing NaN, one zero-length-norm (all-zero) vector.

Everything is a pure function of the row key — bit-reproducible.

Usage: python tools/gen_adversarial.py [--base /root/testdata/sf0.001]
                                       [--out .data/adversarial]
"""

from __future__ import annotations

import argparse
import os

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# primary/ordering keys kept non-null so frames keep identity; everything
# else is fair game
_KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

_HOSTILE_TEXT = [
    "''",
    "'   '",
    "'x'",
    "'\U0001F600\U0001F680 café élève'",
    "'漢字テスト 中文 日本語'",
    "'مرحبا שלום'",
    "'ééé combining'",
    "repeat('z', 10000)",
]


def build(base: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src = os.path.join(base, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        cols = con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
        keys = _KEYS[t]
        k0 = keys[0]
        if t == "supplier":
            con.sql(
                f"COPY (SELECT * FROM '{src}' WHERE 1=0) TO '{dst}' "
                "(FORMAT PARQUET)"
            )
            continue
        exprs = []
        for name, typ, *_ in cols:
            if name in keys:
                exprs.append(name)
                continue
            # deterministic ~5% null mask, decorrelated per column via the
            # column-name hash
            null_pred = f"(hash({k0} + hash('{name}')) % 20 = 0)"
            e = f"CASE WHEN {null_pred} THEN NULL ELSE {name} END"
            if t == "events" and name == "user_id":
                e = (f"CASE WHEN {null_pred} THEN NULL "
                     f"WHEN hash({k0}) % 10 < 9 THEN 7 ELSE {name} END")
            if t == "lineitem" and name == "l_suppkey":
                e = (f"CASE WHEN {null_pred} THEN NULL "
                     f"WHEN hash({k0} * 31 + 5) % 10 < 9 THEN 1 "
                     f"ELSE {name} END")
            if t == "documents" and name == "text":
                arms = " ".join(
                    f"WHEN hash({k0} * 7 + 3) % 25 = {i} THEN {s}"
                    for i, s in enumerate(_HOSTILE_TEXT)
                )
                e = (f"CASE WHEN {null_pred} THEN NULL {arms} "
                     f"ELSE {name} END")
            if t == "embeddings" and name == "embedding":
                e = (
                    f"CASE WHEN {null_pred} THEN NULL "
                    f"WHEN hash({k0} * 13 + 1) % 50 = 0 "
                    f"THEN CAST([] AS FLOAT[]) "
                    f"WHEN hash({k0} * 13 + 1) % 50 = 1 "
                    f"THEN list_transform({name}, "
                    f"x -> CAST('nan' AS FLOAT)) "
                    f"WHEN {k0} = 42 "
                    f"THEN list_transform({name}, x -> CAST(0 AS FLOAT)) "
                    f"ELSE {name} END"
                )
            exprs.append(f"{e} AS {name}")
        con.sql(
            f"COPY (SELECT {', '.join(exprs)} FROM '{src}') TO '{dst}' "
            "(FORMAT PARQUET)"
        )
    con.close()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".data",
            "adversarial",
        ),
    )
    args = ap.parse_args()
    build(args.base, args.out)
    print(f"adversarial fixture written to {args.out}")
