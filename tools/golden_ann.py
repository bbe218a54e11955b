#!/usr/bin/env python3
"""Regenerate the recorded sf0.01 goldens for the deterministic
estimator queries whose oracles are VALUES literals (r16 verdict ask
#8): d08/d17/d30 (Similarity.D08/D17/D30GoldenRows) and
d13_distinct_sketch's approx side (Corpus d13 oracle join literal).

Only needed if /root/testdata is ever rebuilt (it is frozen, seed=42).
Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/vg d08_ann_lsh d17_ivf_ann d30_knn_classify_ann d13_distinct_sketch"
  python3 tools/golden_ann.py /tmp/vg
Paste the printed blocks over the recorded literals.
"""
import sys

import duckdb


def main():
    outdir = sys.argv[1]
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, predicted_label, votes FROM "
        f"read_parquet('{outdir}/d30_knn_classify_ann/*.parquet') "
        f"ORDER BY vec_id").fetchall()
    parts = [f"({v}L,{p},{n}L)" for v, p, n in rows]
    print(f"// D30GoldenRows ({len(rows)} rows):")
    for i in range(0, len(parts), 12):
        tail = "," if i + 12 < len(parts) else ""
        print("      " + ", ".join(parts[i:i + 12]) + tail)
    d08 = con.execute(
        f"SELECT vec_id, neighbor_id, sim FROM "
        f"read_parquet('{outdir}/d08_ann_lsh/*.parquet') "
        f"ORDER BY vec_id, neighbor_id").fetchall()
    parts = [f"({v}L,{n}L,{s!r})" for v, n, s in d08]
    print(f"// D08GoldenRows ({len(d08)} rows):")
    for i in range(0, len(parts), 8):
        tail = "," if i + 8 < len(parts) else ""
        print("      " + ", ".join(parts[i:i + 8]) + tail)
    d17 = con.execute(
        f"SELECT vec_id, neighbor_id, sim FROM "
        f"read_parquet('{outdir}/d17_ivf_ann/*.parquet') "
        f"ORDER BY vec_id, neighbor_id").fetchall()
    parts = [f"({v}L,{n}L,{s!r})" for v, n, s in d17]
    print(f"// D17GoldenRows ({len(d17)} rows):")
    for i in range(0, len(parts), 8):
        tail = "," if i + 8 < len(parts) else ""
        print("      " + ", ".join(parts[i:i + 8]) + tail)
    d13 = con.execute(
        f"SELECT lang, approx_distinct FROM "
        f"read_parquet('{outdir}/d13_distinct_sketch/*.parquet') "
        f"ORDER BY lang").fetchall()
    print("// d13 approx literal:")
    print(", ".join(f"('{lang}', CAST({n} AS BIGINT))" for lang, n in d13))


if __name__ == "__main__":
    main()
