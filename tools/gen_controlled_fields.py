#!/usr/bin/env python3
"""Regenerate the controlled-vocabulary TSV resources from the reference's
public authority lists (feed_ursus/controlled_fields.py). Data-only port:
these are public controlled vocabularies (LoC / CC / IIIF URIs and MARC
language codes); parity requires the exact tables. Stored as resources
(id <TAB> label), loaded by graft.docprep.ControlledVocab."""
import ast

SRC = "/root/reference/feed_ursus/controlled_fields.py"
OUT = "/root/repo/src/main/resources/graft/controlled_vocab"

text = open(SRC).read()
tree = ast.parse(text)
enums, langs = {}, None
for node in tree.body:
    if isinstance(node, ast.Assign) and isinstance(node.value, ast.Call) \
       and getattr(node.value.func, "id", "") == "Enum":
        enums[node.targets[0].id] = list(ast.literal_eval(node.value.args[1]))
    elif isinstance(node, ast.ClassDef) and any(getattr(b, "id", "") == "Enum" for b in node.bases):
        enums[node.name] = [(st.targets[0].id, st.value.value) for st in node.body
                            if isinstance(st, ast.Assign) and isinstance(st.value, ast.Constant)]
    elif isinstance(node, ast.Assign) and getattr(node.targets[0], "id", "") == "language_names":
        langs = ast.literal_eval(node.value)

import os
os.makedirs(OUT, exist_ok=True)
def write(name, pairs):
    with open(f"{OUT}/{name}.tsv", "w") as f:
        for k, v in pairs:
            f.write(f"{k}\t{v}\n")
    print(f"{name}.tsv: {len(pairs)}")

write("license", enums["License"])
write("resource_type", enums["ResourceType"])
write("rights_statement", enums["RightsStatement"])
write("text_direction", enums["TextDirection"])
write("viewing_hint", enums["ViewingHint"])
write("language_names", sorted(langs.items()))
