#!/usr/bin/env python3
"""Field-by-field parity harness: run the REFERENCE'S OWN pydantic model
(feed_ursus.ursus_solr_record.UrsusSolrRecord, pysolr stubbed since the
sandbox has no Solr client) over a CSV, and diff against the Spark
projection's JSON dump (graft.UrsusParityDump).

Usage: python3 tools/ursus_parity.py <csv> <sparkJsonDir>
Exit 0 when every reference field matches (modulo documented deltas)."""
import csv as csvmod
import datetime
import glob
import json
import sys
import types

# ---- pysolr stub (only _from_python is used by the reference) ----
fake = types.ModuleType("pysolr")


class _Solr:
    def __init__(self, url, **kw):
        pass

    def _from_python(self, value):
        # mirrors pysolr.Solr._from_python for datetimes
        if isinstance(value, datetime.datetime):
            if value.tzinfo is not None:
                value = value.astimezone(datetime.timezone.utc).replace(tzinfo=None)
            return value.strftime("%Y-%m-%dT%H:%M:%SZ")
        return str(value)


fake.Solr = _Solr
sys.modules["pysolr"] = fake
sys.path.insert(0, "/root/reference")

from dateutil.parser import isoparse  # noqa: E402
from feed_ursus.ursus_solr_record import UrsusSolrRecord  # noqa: E402

UrsusSolrRecord._now = classmethod(lambda cls: isoparse("2026-05-19T19:20:00Z"))

# Documented deltas (COVERAGE.md): the Spark projection is per-column
# (less-strict semantics); pydantic AnyUrl normalization of access_copy is
# not replicated (we keep the raw URL).
SKIP_FIELDS = {"access_copy_ssi"}

csv_path, spark_dir = sys.argv[1], sys.argv[2]
rows = list(csvmod.DictReader(open(csv_path)))
ref_docs = {}
for row in rows:
    rec = UrsusSolrRecord.model_validate(row)
    d = rec.model_dump(mode="json")
    ref_docs[d["ark_ssi"]] = d

mine = {}
for f in glob.glob(f"{spark_dir}/part-*.json") + glob.glob(f"{spark_dir}/*.json"):
    for line in open(f):
        if line.strip():
            d = json.loads(line)
            mine[d["ark_ssi"]] = d

assert set(ref_docs) == set(mine), (set(ref_docs) ^ set(mine))

n_fields, n_diffs = 0, 0
for ark, ref in sorted(ref_docs.items()):
    got = mine[ark]
    for field, rv in sorted(ref.items()):
        if field in SKIP_FIELDS:
            continue
        if rv in (None, [], {}):
            # reference nulls; spark json drops nulls — field must be absent
            # or null-ish on our side
            gv = got.get(field)
            if gv not in (None, [], ""):
                n_diffs += 1
                print(f"[{ark}] {field}: ref=EMPTY got={gv!r}")
            continue
        n_fields += 1
        gv = got.get(field)
        if gv != rv:
            n_diffs += 1
            print(f"[{ark}] {field}:\n  ref={rv!r}\n  got={gv!r}")

print(f"compared {len(ref_docs)} records, {n_fields} non-empty reference "
      f"field values, {n_diffs} diffs")
sys.exit(0 if n_diffs == 0 else 1)
