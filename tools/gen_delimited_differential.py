#!/usr/bin/env python3
"""Differential vectors for the delimited reader: runs the REFERENCE's
DelimitedFile (idigbio_ingestion/lib/delimited.py:127-299) over
structured-random CSV/TSV files — quoted fields with embedded
delimiters and doubled quotes, whitespace padding, empty fields,
wrong-length lines (skipped by the reference), duplicate and unmapped
headers, QUOTE_NONE mode — and records the surviving row dicts plus
the inferred rowtype for DelimitedDifferentialSpec to replay through
graft.ingest.Delimited.read.

Output JSONL, one vector per line:
  {"name": ..., "csv": <file text>, "delimiter": ..., "fieldenc": ...,
   "rowtype": ..., "fields": {"0": "dwc:...", ...},
   "rows": [{canonical: value, ...}, ...]}    (kept rows, in order)
"""
import sys, types, json, random, io, os, tempfile


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
stub("idb.helpers.logging", idblogger=dummy, getLogger=lambda *a: dummy)
sys.path.insert(0, "/root/reference")
import idb.helpers  # noqa: E402
sys.modules["idb.helpers.logging"].__package__ = "idb.helpers"
import idigbio_ingestion.lib.delimited as _dlm  # noqa: E402
# reference bitrot: delimited.py:194 references NO_CLASS__UNKNOWN_FIELD
# without importing it from fieldnames (where it is 'Unknown') — every
# DelimitedFile() with a non-empty header raises NameError as shipped.
# Patch the intended import so the rest of the class is testable.
from idb.helpers.fieldnames import NO_CLASS__UNKNOWN_FIELD  # noqa: E402
_dlm.NO_CLASS__UNKNOWN_FIELD = NO_CLASS__UNKNOWN_FIELD
DelimitedFile = _dlm.DelimitedFile

rnd = random.Random(int(sys.argv[1]) if len(sys.argv) > 1 else 47)
N = int(sys.argv[2]) if len(sys.argv) > 2 else 150
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/dlmdiff/vectors.jsonl"

# header pool: mapped DwC terms of several classes (drives the rowtype
# vote), unmapped-but-voting unknowns, and dropped (None-name) headers
MAPPED = ["dwc:catalogNumber", "catalognumber", "dwc:occurrenceID",
          "scientificName", "dwc:eventDate", "dwc:decimalLatitude",
          "dwc:decimalLongitude", "basisOfRecord", "dwc:recordedBy",
          "coreid", "dcterms:identifier", "dwc:Identification",
          "dwc:measurementType", "dwc:measurementValue", "idigbio:uuid"]
UNMAPPED = ["frobnicator", "x_custom_77", "internal notes"]

VALUES = ["v", "Specimen 12", "  padded  ", "", " ", "a,b", 'say ""hi""',
          "line\nbreak", "12.5", "-81.2", "PreservedSpecimen",
          "Gen\tTab", "tail ", "Ünïcødé",
          # Unicode whitespace padding: python str.strip() removes all
          # of these (NBSP, figure/thin space, ideographic space, file
          # separator, NEL) while Java's ASCII \s does not — the graft
          # reader must match python's isspace set exactly
          "\xa0nbsp-pad\xa0", " fig thin ", "　wide　",
          "\x1cfs-nel\x85", "\xa0", " line-sep "]


def quote_field(v, d, q):
    need = q and (d in v or "\n" in v or '"' in v or rnd.random() < 0.3)
    if not need:
        # unquotable content must be kept out of QUOTE_NONE files
        return v.replace(d, " ").replace("\n", " ").replace('"', "'")
    return '"' + v.replace('"', '""') + '"'


vectors = []
for i in range(N):
    # the delimiter is passed in the TEXT form meta.xml ships ("\\t",
    # "tab", ...) — a literal tab char is .strip()ed to "" by the
    # reference's normalizer and silently falls back to comma
    dtoken = rnd.choice([",", "\\t", "tab", "|", "0x09"])
    d = "\t" if dtoken in ("\\t", "tab", "0x09") else dtoken
    fieldenc = '"' if rnd.random() < 0.8 else ""
    ncols = rnd.randint(2, 7)
    headers = []
    while len(headers) < ncols:
        r = rnd.random()
        if r < 0.75:
            headers.append(rnd.choice(MAPPED))
        elif r < 0.9:
            headers.append(rnd.choice(UNMAPPED))
        else:
            headers.append(rnd.choice(headers or MAPPED))  # duplicate
    nrows = rnd.randint(1, 8)
    lines = [d.join(quote_field(h, d, fieldenc == '"') for h in headers)]
    for _ in range(nrows):
        vals = [rnd.choice(VALUES) for _ in range(ncols)]
        kind = rnd.random()
        if kind < 0.1:
            vals = vals[:-rnd.randint(1, ncols - 1)]      # short line
        elif kind < 0.2:
            vals = vals + [rnd.choice(VALUES)]            # long line
        lines.append(d.join(quote_field(v, d, fieldenc == '"') for v in vals))
    text = "\r\n".join(lines) + "\r\n"

    with tempfile.NamedTemporaryFile("w", encoding="utf-8", newline="",
                                     suffix=".csv", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        df = DelimitedFile(path, delimiter=dtoken, fieldenc=fieldenc)
        rows = []
        while True:
            try:
                rows.append(dict(df.readline()))
            except StopIteration:
                break
        vectors.append({
            "name": f"v{i}", "csv": text, "delimiter": dtoken,
            "fieldenc": fieldenc, "rowtype": df.rowtype,
            # raw header tokens as python csv parses them — the vote
            # input (get_canonical_name is NOT class-idempotent: the
            # reference table maps 'dwc:scientificName' to a typo'd
            # class 'dwc:Occurence' but 'scientificName' to
            # 'dwc:Occurrence', so re-voting over canonical names
            # diverges from voting over raw headers)
            "header": headers,
            "fields": {str(k): v for k, v in df.fields.items()},
            "rows": rows,
        })
        df.close()
    finally:
        os.unlink(path)

os.makedirs(os.path.dirname(OUT), exist_ok=True)
with open(OUT, "w") as f:
    for v in vectors:
        f.write(json.dumps(v, sort_keys=True) + "\n")
print(f"wrote {len(vectors)} vectors to {OUT}")
