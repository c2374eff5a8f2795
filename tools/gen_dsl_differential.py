#!/usr/bin/env python3
"""Randomized compound-DSL differential: random iDigBio Query Format
JSONs (term / terms / prefix / range / exists / missing over distinct
orders fields, implicit AND) with expected o_orderkey sets computed by
DuckDB from per-predicate SQL templates — the same templates the
hand-written per-predicate oracles use, INDEPENDENT of the Scala
compiler under test. DslDifferentialSpec replays each DSL through the
real Query.parse → Compile path.
"""
import sys, json, random
import duckdb

rnd = random.Random(int(sys.argv[1]) if len(sys.argv) > 1 else 21)
N = int(sys.argv[2]) if len(sys.argv) > 2 else 150
SF = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
OUT = sys.argv[4] if len(sys.argv) > 4 else "/tmp/dsldiff/vectors.jsonl"

con = duckdb.connect()
con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')")

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
              "9-BOGUS"]
STATUSES = ["O", "F", "P", "X"]


def sql_quote(v):
    return "'" + str(v).replace("'", "''") + "'"


def gen_predicate(field):
    """Returns (dsl_value, sql_condition)."""
    if field == "o_orderpriority":
        kind = rnd.choice(["term", "terms", "prefix", "exists", "missing"])
        if kind == "term":
            v = rnd.choice(PRIORITIES)
            if rnd.random() < 0.3:
                v = v.lower() if rnd.random() < 0.5 else v.title()
            return v, f"lower(o_orderpriority) = {sql_quote(v.lower())}"
        if kind == "terms":
            vs = rnd.sample(PRIORITIES, rnd.randint(1, 3))
            inl = ", ".join(sql_quote(v.lower()) for v in vs)
            return vs, f"lower(o_orderpriority) IN ({inl})"
        if kind == "prefix":
            v = rnd.choice(["1-", "2-H", "5", "9-NO", ""])
            return ({"type": "prefix", "value": v},
                    f"lower(o_orderpriority) LIKE {sql_quote(v.lower() + '%')}")
        if kind == "exists":
            return ({"type": "exists"}, "o_orderpriority IS NOT NULL")
        return ({"type": "missing"}, "o_orderpriority IS NULL")
    if field == "o_orderstatus":
        v = rnd.choice(STATUSES)
        if rnd.random() < 0.5:
            vs = rnd.sample(STATUSES, rnd.randint(1, 2))
            inl = ", ".join(sql_quote(x.lower()) for x in vs)
            return vs, f"lower(o_orderstatus) IN ({inl})"
        return v, f"lower(o_orderstatus) = {sql_quote(v.lower())}"
    if field == "o_totalprice":
        ops = rnd.sample(["gte", "gt", "lte", "lt"], rnd.randint(1, 2))
        spec = {"type": "range"}
        conds = []
        for op in ops:
            b = round(rnd.uniform(0, 500000), 2)
            spec[op] = b
            conds.append(f"o_totalprice {'>=' if op=='gte' else '>' if op=='gt' else '<=' if op=='lte' else '<'} {b}")
        return spec, " AND ".join(conds)
    # o_orderkey integer range
    ops = rnd.sample(["gte", "lt"], rnd.randint(1, 2))
    spec = {"type": "range"}
    conds = []
    for op in ops:
        b = rnd.randint(0, 1600)
        spec[op] = b
        conds.append(f"o_orderkey {'>=' if op=='gte' else '<'} {b}")
    return spec, " AND ".join(conds)


rows = []
for i in range(N):
    fields = rnd.sample(
        ["o_orderpriority", "o_orderstatus", "o_totalprice", "o_orderkey"],
        rnd.randint(1, 3))
    dsl = {}
    conds = []
    for f in fields:
        v, c = gen_predicate(f)
        dsl[f] = v
        conds.append(f"({c})")
    sql = ("SELECT o_orderkey FROM orders WHERE " + " AND ".join(conds) +
           " ORDER BY o_orderkey")
    expect = [r[0] for r in con.execute(sql).fetchall()]
    rows.append({"id": i, "dsl": json.dumps(dsl), "expect": expect})

import os
os.makedirs(os.path.dirname(OUT), exist_ok=True)
with open(OUT, "w") as f:
    for r in rows:
        f.write(json.dumps(r) + "\n")
nonempty = sum(1 for r in rows if r["expect"])
print(f"wrote {N} dsl vectors ({nonempty} with non-empty result sets)")
