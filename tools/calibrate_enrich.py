#!/usr/bin/env python3
"""Same-machine floor for the enrich benchmark.

Runs the REFERENCE's own pure-Python grabAll loop
(idb/helpers/conversions.py:932-964) on this sandbox over the exact
record shape the q_enrich benchmark feeds graft.etl.Enrich.records
(see queries/EtlQueries.scala — 7 dwc fields synthesized from orders),
and prints rec/s for a 1000-record sample, matching the reference's
own timing block (conversions.py:915-930).

Native/geo/network deps absent from this container (pyproj, shapely,
fiona, python-magic, the gnparser socket service) are stubbed to
no-ops BEFORE import. Every stub removes work from the reference
path, so the measured floor is CONSERVATIVE — the real reference
would be slower than this number, never faster. The Spark side
(q_enrich) likewise omits datum reprojection and runs reverse
geocoding only in the dedicated geo-correction operator, so the two
sides do comparable work.

Usage: python3 tools/calibrate_enrich.py [n_records]
"""
import sys
import time
import types


def stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


class _CRS:
    @staticmethod
    def from_user_input(x):
        return object()

    @staticmethod
    def from_epsg(x):
        return object()


class _Transformer:
    @staticmethod
    def from_crs(a, b, always_xy=True):
        raise RuntimeError("pyproj unavailable in sandbox")


stub("pyproj", CRS=_CRS, Transformer=_Transformer)
shp = stub("shapely")
shp.wkt = stub("shapely.wkt", loads=lambda s: None)
stub("shapely.geometry", Polygon=object, mapping=lambda o: None,
     shape=lambda g: None, Point=object)
stub("shapely.prepared", prep=lambda g: g)
stub("fiona", open=lambda p: None)
stub("magic", from_buffer=lambda *a, **kw: "application/octet-stream")
# rg loads a world-borders shapefile via fiona; stub the whole module
# (get_country -> None == "no reverse-geocode hit", the cheap path)
stub("idb.helpers.rg", get_country=lambda lon, lat, eez=False: None)

sys.path.insert(0, "/root/reference")
import idb.helpers  # noqa: E402  (package init before submodule stub use)
sys.modules["idb.helpers.rg"].__package__ = "idb.helpers"
from idb.helpers import conversions  # noqa: E402

# never even attempt the gnparser socket connect
conversions.bioserv._sock = False

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1000

# the q_enrich record shape (EtlQueries.qEnrich): 7 dwc fields built
# from integer keys, same value distributions
records = []
for i in range(N):
    ok = i * 7 + 1          # stand-ins for o_orderkey / o_custkey
    ck = i * 3 + 2
    pri = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"][i % 5]
    bor = {"1-URGENT": "Preserved Specimen", "2-HIGH": "Fossil bones",
           "3-MEDIUM": "machine observation",
           "4-NOT SPECIFIED": "mystery meat"}.get(pri, "unknown sheet")
    records.append({
        "dwc:scientificName": f"Genus{ck % 50} epithet{ok % 100}",
        "dwc:eventDate": f"{1992 + ok % 7:04d}-{1 + ok % 12:02d}-{1 + ok % 28:02d}",
        "dwc:decimalLatitude": f"{ok % 170 - 85}.{ok % 1000:03d}",
        "dwc:decimalLongitude": f"{ok % 340 - 170}.{ck % 1000:03d}",
        "dwc:minimumElevationInMeters": f"{ok % 5000}.5 m",
        "dwc:individualCount": f"{ck % 9 + 1},{ok % 1000:03d}",
        "dwc:basisOfRecord": bor,
    })

# warm-up (interning, regex compile, locale)
for d in records[:50]:
    conversions.grabAll("records", dict(d))

t0 = time.perf_counter()
for d in records:
    conversions.grabAll("records", dict(d))
dt = time.perf_counter() - t0

rec_s = N / dt
print(f"grabAll: {N} records in {dt*1000:.1f} ms "
      f"({dt*1000/N:.4f} ms/rec, {rec_s:.0f} rec/s single-core)")
