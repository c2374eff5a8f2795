#!/usr/bin/env python3
"""Differential vectors for field-name canonicalization: dumps the
REFERENCE's entire translate_dict (idb/helpers/fieldnames.py:92-589)
for a one-to-one table compare against FieldnamesTable.translate, and
runs structured-random mangled headers through get_canonical_name
(:594-631) for behavioral replay through Fieldnames.canonical.

Output JSONL:
  {"kind":"table","key":k,"name":n|null,"cls":c}   one per dict entry
  {"kind":"probe","f":input,"name":n|null,"cls":c} randomized vectors
"""
import sys, json, random

sys.path.insert(0, "/root/reference")
from idb.helpers.fieldnames import translate_dict, get_canonical_name  # noqa: E402

rnd = random.Random(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
N = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/fndiff/vectors.jsonl"

keys = sorted(translate_dict.keys())

# mangles: unprintables injected anywhere (stripped before lookup, so
# known keys must still resolve), case flips (dict probe is
# case-SENSITIVE), prefix/suffix noise, and pure-random unknowns
UNPRINT = ["é", "用", "ÿ", "﻿", "\x00", "\x1b"]


def mangle(k):
    r = rnd.random()
    if r < 0.35:   # inject unprintables at random positions
        pos = rnd.randint(0, len(k))
        return k[:pos] + rnd.choice(UNPRINT) + k[pos:] + (
            rnd.choice(UNPRINT) if rnd.random() < 0.5 else "")
    if r < 0.55:   # case flip one char
        pos = rnd.randrange(len(k))
        c = k[pos]
        return k[:pos] + (c.lower() if c.isupper() else c.upper()) + k[pos + 1:]
    if r < 0.7:    # whitespace padding (printable, NOT stripped by ref)
        return " " + k + "\t"
    if r < 0.85:   # namespace noise
        return rnd.choice(["x:", "dwc:", ""]) + k + rnd.choice(["", "2"])
    return "".join(rnd.choice("abcXYZ:_ 123é") for _ in range(rnd.randint(1, 20)))


rows = []
for k in keys:
    v = translate_dict[k]
    rows.append({"kind": "table", "key": k, "name": v[0], "cls": v[1]})
for i in range(N):
    f = mangle(rnd.choice(keys))
    n, c = get_canonical_name(f)
    rows.append({"kind": "probe", "f": f, "name": n, "cls": c})

import os
os.makedirs(os.path.dirname(OUT), exist_ok=True)
with open(OUT, "w") as fh:
    for r in rows:
        fh.write(json.dumps(r, ensure_ascii=True) + "\n")
print(f"wrote {len(keys)} table entries + {N} probes")
