#!/usr/bin/env python3
"""Differential vectors for content-address hashing: runs the
REFERENCE's calcEtag and objectHasher (idb/helpers/etags.py:7-16,
41-79 — pure hashlib/json, imported directly) over structured-random
records and emits JSONL for EtagsDifferentialSpec to replay through
graft.hash.Etags. Strings exercise the full escape surface (controls,
quotes, backslashes, BMP + astral unicode); numbers stay in the
production range ([1e-4, 1e16) magnitude, ≤6 decimals) where float
repr is documented to match.
"""
import sys, json, random

sys.path.insert(0, "/root/reference")
from idb.helpers.etags import calcEtag, objectHasher  # noqa: E402

rnd = random.Random(int(sys.argv[1]) if len(sys.argv) > 1 else 13)
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/etagdiff/vectors.jsonl"

PIECES = ["abc", "DEF", "xyz9", '"', "\\", "/", "\n", "\t", "\r", "\b",
          "\f", "\x00", "\x01", "\x1f", "é", "ß", "用語", "Ω",
          "😀", "𝔘", " ", " ", " ", ":", ",", "{", "}", "[", "]"]


def rstr(maxp=5):
    return "".join(rnd.choice(PIECES) for _ in range(rnd.randint(0, maxp)))


def scalar():
    r = rnd.random()
    if r < 0.5:
        return rstr()
    if r < 0.65:
        return rnd.randint(-10**12, 10**12)
    if r < 0.8:
        return round(rnd.uniform(-1e6, 1e6), rnd.randint(0, 6))
    if r < 0.9:
        return rnd.choice([True, False])
    return None


def value(depth=0):
    r = rnd.random()
    if depth >= 2 or r < 0.6:
        return scalar()
    if r < 0.8:
        return [value(depth + 1) for _ in range(rnd.randint(0, 4))]
    return {rstr(2) or f"k{rnd.randint(0,9)}": value(depth + 1)
            for _ in range(rnd.randint(0, 4))}


rows = []
for i in range(N):
    if rnd.random() < 0.5:
        data = {rstr(3) or f"f{j}": rstr() for j in range(rnd.randint(0, 8))}
    else:
        data = {rstr(3) or f"f{j}": value() for j in range(rnd.randint(0, 6))}
    rows.append({
        "id": i,
        "data": data,
        "etag": calcEtag(dict(data)),
        "oh": objectHasher("sha256", data),
        "oh_sa": objectHasher("sha256", data, sort_arrays=True),
        "oh_nk": objectHasher("md5", data, sort_keys=False),
    })

import os
os.makedirs(os.path.dirname(OUT), exist_ok=True)
with open(OUT, "w") as f:
    for r in rows:
        f.write(json.dumps(r, ensure_ascii=True) + "\n")
print(f"wrote {N} etag vectors")
