#!/usr/bin/env python3
"""Record every (input HTML, parsed records) pair that the unmodified
reference's parse_personnel_string_v4 produces during a full corpus run —
the unit-level correctness anchor for graft.parse.Personnel.
Dev-tool only (driver-side python)."""
import json, os, sys, types, importlib.util

spec = importlib.util.spec_from_file_location("golden_gen", os.path.join(os.path.dirname(__file__), "golden_gen.py"))
gg = importlib.util.module_from_spec(spec)
spec.loader.exec_module(gg)
sys.modules["bs4"] = gg.fake_bs4
sys.modules["psycopg2"] = gg.fake_psycopg2
import logging
logging.disable(logging.CRITICAL)

src = open("/root/reference/populate_db_ru_v1.py", encoding="utf-8").read()
src = src.replace('HTML_FOLDER = "/Users/macbook/diplom"', 'HTML_FOLDER = "/root/reference/diplom"')
mod = types.ModuleType("refmod"); mod.__dict__["__name__"] = "refmod"
exec(compile(src, "populate_db_ru_v1.py", "exec"), mod.__dict__)

records = []
orig = mod.parse_personnel_string_v4
def wrapped(raw):
    res = orig(raw)
    records.append({"input": raw, "output": [dict(r) for r in res]})
    return res
mod.parse_personnel_string_v4 = wrapped

conn = gg.FakeConn()
mod.setup_database(conn)
for c in (mod.inspector_cache, mod.location_cache, mod.rank_cache, mod.profession_cache, mod.education_cache):
    c.clear()
for filename in mod.HTML_FILES:
    mod.process_html_file(conn, os.path.join(mod.HTML_FOLDER, filename))

out = os.path.join(os.path.dirname(__file__), "golden", "personnel_cases.jsonl")
with open(out, "w", encoding="utf-8") as f:
    for r in records:
        f.write(json.dumps(r, ensure_ascii=False) + "\n")
print("cases:", len(records))
