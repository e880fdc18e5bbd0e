#!/usr/bin/env python3
"""Sinai field-by-field parity harness: run the REFERENCE'S OWN pydantic
model (feed_sinai.solr_record.ManuscriptSolrRecord) over the Spark pipeline's
merged manuscripts and diff EVERY field against the Spark projection — the
Sinai analog of tools/ursus_parity.py, usable on any corpus (reference
fixtures or synthetic).

The `edtf` package is absent offline; sinai_types only uses
parse_edtf(v).year on plain EDTF dates (Iso.years), so a minimal stub
suffices and is exact for the attested data shapes.

Usage:
  sbt "runMain graft.SinaiParityDump entities /root/reference/tests/sinai/export_test /tmp/sp"
  python3 tools/sinai_parity.py /tmp/sp
Exit 0 when every field of every record matches."""
import json
import re
import sys
import types
from pathlib import Path

# ---- edtf stub (parse_edtf(v).year over plain EDTF dates) ----
edtf = types.ModuleType("edtf")


class _Date:
    def __init__(self, y):
        self.year = y


def _parse_edtf(v):
    m = re.match(r"^(-?\d{1,4})", str(v))
    if not m:
        raise ValueError(v)
    return _Date(m.group(1))


edtf.Date = _Date
edtf.parse_edtf = _parse_edtf
sys.modules["edtf"] = edtf
sys.path.insert(0, "/root/reference")

import feed_sinai.sinai_types as st  # noqa: E402
from feed_sinai.solr_record import ManuscriptSolrRecord  # noqa: E402


def unalias(n):
    """Invert the dump-only serialization shape so the merged JSON validates:
    uto_layer_ark is a serialization alias of id; the excluded-but-required
    `layer` field is restored empty."""
    if isinstance(n, dict):
        out = {("id" if k == "uto_layer_ark" else k): unalias(v) for k, v in n.items()}
        if "ot_layer" in out or "guest_layer" in out or "uto" in out:
            out.setdefault("layer", [])
        return out
    if isinstance(n, list):
        return [unalias(x) for x in n]
    return n


out_dir = Path(sys.argv[1])
mine = {}
for line in (out_dir / "records.jsonl").read_text().splitlines():
    if line.strip():
        d = json.loads(line)
        mine[d["ark_ssi"]] = d

n_fields, n_diffs, n_records = 0, 0, 0
for f in sorted((out_dir / "merged").glob("*.json")):
    merged = json.loads(f.read_text())
    obj = st.ManuscriptObjectMerged.model_validate(unalias(merged))
    ref = json.loads(ManuscriptSolrRecord(ms_obj=obj).model_dump_json())
    got = mine[ref["ark_ssi"]]
    n_records += 1
    for field, rv in sorted(ref.items()):
        gv = got.get(field)
        if rv in (None, [], {}):
            if gv not in (None, [], ""):
                n_diffs += 1
                print(f"[{ref['ark_ssi']}] {field}: ref=EMPTY got={gv!r}")
            continue
        n_fields += 1
        # origin_date_values_tesim is set[str] in the reference
        # (solr_record.py:652-659): pydantic dumps sets in hash-iteration
        # order, so only the VALUE SET is specified; we emit it sorted
        if field == "origin_date_values_tesim" and isinstance(rv, list):
            rv, gv = sorted(rv), sorted(gv or [])
        if gv != rv:
            n_diffs += 1
            print(f"[{ref['ark_ssi']}] {field}:\n  ref={str(rv)[:160]!r}\n  got={str(gv)[:160]!r}")

print(f"compared {n_records} records, {n_fields} non-empty reference "
      f"field values, {n_diffs} diffs")
sys.exit(0 if n_diffs == 0 else 1)
