#!/usr/bin/env python3
"""Differential vectors for the RSS recordid derivation: runs the
reference's id_func (idigbio_ingestion/update_publisher_recordset.py
:61-96) over structured-random (portal_url, entry) pairs and emits
JSONL for RssIdDifferentialSpec to replay through
graft.ingest.Rss.recordId. Service plumbing is stubbed; the id logic
under test is the reference's own bytecode."""
import sys, types, json, random


def stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


class _Dummy:
    def __call__(self, *a, **k):
        return self

    def __getattr__(self, name):
        return self


dummy = _Dummy()
stub("requests", get=dummy, Session=dummy)
stub("feedparser", __version__="5.2.0", parse=dummy)
stub("botocore")
stub("idb.config", config={}, ENV="sandbox")
stub("idb.postgres_backend.db", PostgresDB=dummy, MediaObject=dummy,
     DictCursor=object)
stub("idb.helpers.storage", IDigBioStorage=dummy)
stub("idb.helpers.logging", idblogger=dummy)
stub("idigbio_ingestion.lib.util", download_file=dummy)
stub("idigbio_ingestion.lib.eml", parseEml=dummy)
sys.path.insert(0, "/root/reference")
import idb.helpers  # noqa: E402
for n in ("idb.config", "idb.postgres_backend.db", "idb.helpers.storage",
          "idb.helpers.logging"):
    sys.modules[n].__package__ = n.rsplit(".", 1)[0]
import idigbio_ingestion  # noqa: E402
for n in ("idigbio_ingestion.lib.util", "idigbio_ingestion.lib.eml"):
    sys.modules[n].__package__ = "idigbio_ingestion.lib"
from idigbio_ingestion.update_publisher_recordset import id_func  # noqa: E402

rnd = random.Random(int(sys.argv[1]) if len(sys.argv) > 1 else 31)
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/rssdiff/vectors.jsonl"

PORTALS = ["http://portal.example.org/", "https://x.y/p/", ""]
# ids exercising the ipt version-suffix strip and case folding
ID_SHAPES = [
    "http://ipt.x.org/resource?r=ds/v2.31", "HTTP://X/RES/v1",
    "urn:uuid:ABC-123/v9.", "http://a/b/v", "http://a/b/v12x",
    "http://a/b/V3", "plain-id", "id/v2/extra", "/v5", "x/v0.0",
    "a/v999999.999999", "MiXeD-CaSe/V2.3", "ends/v2.3.4",
]


def entry():
    e = {}
    r = rnd.random()
    if r < 0.55:
        e["id"] = rnd.choice(ID_SHAPES) + rnd.choice(["", "/v3", "/V7.1", "x"])
    elif r < 0.85:
        e["collid"] = str(rnd.randint(0, 500))
    # else: neither → None
    if rnd.random() < 0.2:
        e["collid"] = str(rnd.randint(0, 500))  # id wins when both present
    return e


rows = []
for i in range(N):
    p = rnd.choice(PORTALS)
    e = entry()
    rows.append({"id": i, "portal": p,
                 "eid": e.get("id"), "collid": e.get("collid"),
                 "exp": id_func(p, dict(e))})

import os
os.makedirs(os.path.dirname(OUT), exist_ok=True)
with open(OUT, "w") as f:
    for r in rows:
        f.write(json.dumps(r) + "\n")
print(f"wrote {N} rss-id vectors")
