#!/usr/bin/env python3
"""Convert tools/golden/*.json to parquet with schemas that exactly match
the engine's e01-e06 outputs, so the driver's DuckDB gate can hash-compare
the corpus ETL against an independent oracle:

    oracleSql: SELECT ... FROM read_parquet('/root/repo/tools/golden/<t>.parquet')

Column types mirror what graft.Verify writes (ReferenceEtl's Dataset
schemas): IDs int64, Year/statistics int32, flags bool, text utf8. The
all-null Notes/RankType columns are string (TEXT NULL in the reference
DDL, populate_db_ru_v1.py:160-179).

Run (dev-side; pyarrow ships with the driver tooling):
    python3 tools/golden_to_parquet.py
"""
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "golden")

SCHEMAS = {
    "assignments": pa.schema([
        ("AssignmentID", pa.int64()),
        ("InspectorID", pa.int64()),
        ("Year", pa.int32()),
        ("SourceFile", pa.string()),
        ("OkrugName", pa.string()),
        ("GuberniaName", pa.string()),
        ("PositionRole", pa.string()),
        ("UchastokIdentifier", pa.string()),
        ("UchastokDescription", pa.string()),
        ("InspectorLocationID", pa.int64()),
        ("PersonnelRawString", pa.string()),
        ("RankID", pa.int64()),
        ("ProfessionID", pa.int64()),
        ("EducationID", pa.int64()),
        ("StartDateInYearRaw", pa.string()),
        ("EndDateInYearRaw", pa.string()),
        ("IsActing", pa.bool_()),
        ("IsVacancy", pa.bool_()),
        ("AssignmentNotes", pa.string()),
        ("EstablishmentsCount", pa.int32()),
        ("WorkerCount", pa.int32()),
        ("BoilerCount", pa.int32()),
    ]),
    "inspectors": pa.schema([
        ("InspectorID", pa.int64()),
        ("FullName", pa.string()),
        ("Notes", pa.string()),
    ]),
    "locations": pa.schema([
        ("LocationID", pa.int64()),
        ("CityName", pa.string()),
        ("GuberniaName", pa.string()),
        ("OkrugName", pa.string()),
        ("LocationType", pa.string()),
    ]),
    "ranks": pa.schema([
        ("RankID", pa.int64()),
        ("Abbreviation", pa.string()),
        ("FullName_RU", pa.string()),
        ("RankType", pa.string()),
    ]),
    "professions": pa.schema([
        ("ProfessionID", pa.int64()),
        ("Abbreviation", pa.string()),
        ("FullName_RU", pa.string()),
    ]),
    "educations": pa.schema([
        ("EducationID", pa.int64()),
        ("Abbreviation", pa.string()),
        ("FullName_RU", pa.string()),
    ]),
}


def main():
    for table, schema in SCHEMAS.items():
        rows = json.load(open(os.path.join(GOLDEN, f"{table}.json")))
        cols = {f.name: [r.get(f.name) for r in rows] for f in schema}
        t = pa.table(cols, schema=schema)
        out = os.path.join(GOLDEN, f"{table}.parquet")
        pq.write_table(t, out)
        print(f"{table}: {len(rows)} rows -> {out}")


if __name__ == "__main__":
    main()
