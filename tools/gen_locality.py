#!/usr/bin/env python3
"""Generate locality TSV resources from the reference's data table.

Reads /root/reference/idb/data_tables/locality_data.py (a pure data
module: dict/set literals, plus the kl_none merge executed at import)
and dumps the four tables the rule assembly needs as UTF-8 TSVs under
src/main/resources/graft/locality/. The Scala side (etl/Locality.scala)
re-implements locality.py's get_data() assembly over these tables.

Run from /root/repo:  python3 tools/gen_locality.py
"""
import io, os, sys

SRC = "/root/reference/idb/data_tables/locality_data.py"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/main/resources/graft/locality")

# The module is py2-flavored but its executable statements (dict/set
# literals, the kl.update merges, an uncalled main()) are valid py3.
src = io.open(SRC, encoding="utf-8").read()
ns = {}
exec(compile(src, SRC, "exec"), ns)

os.makedirs(OUT, exist_ok=True)

def dump(name, rows):
    path = os.path.join(OUT, name + ".tsv")
    with io.open(path, "w", encoding="utf-8") as f:
        for r in rows:
            for cell in r:
                assert "\t" not in cell and "\n" not in cell, (name, r)
            f.write("\t".join(r) + "\n")
    print(f"{name}: {len(rows)} rows -> {path}")

# string_to_iso_code: country -> alpha-3
dump("string_to_iso_code",
     sorted((k, v) for k, v in ns["string_to_iso_code"].items()))

# implied_parent: field \t value \t parent1 [\t parent2]
# (stateprovince -> [continent, country]; country -> [continent])
rows = []
for field, m in ns["implied_parent"].items():
    for v, parents in m.items():
        rows.append((field, v) + tuple(parents))
dump("implied_parent", sorted(rows))

# kl (AFTER the in-module kl_none merge): field \t variant \t canonical
# ("None" is the reference's blank-the-field sentinel, kept verbatim)
rows = []
for field, m in ns["kl"].items():
    for v, canon in m.items():
        rows.append((field, v, canon))
dump("kl", sorted(rows))
