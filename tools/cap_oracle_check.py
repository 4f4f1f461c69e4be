#!/usr/bin/env python3
"""Dev-only companion to graft.tools.CapOracleProbe (r13): replays the
CAPPED jaccard oracle CTE (maxDf mirror of jaccardPairs' hot-shingle cap)
in DuckDB on the planted-hot-shingle corpus the probe wrote, and diffs it
against Spark's own maxDf=10 pairs. The point: prove the capped SQL and
the capped operator agree on a corpus where the cap BINDS (the sf0.01
gate corpus never reaches the cap, so it cannot exercise this path).

Usage: python3 tools/cap_oracle_check.py [/tmp/cap_oracle]
"""
import sys

import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cap_oracle"
con = duckdb.connect()
con.execute(
    f"CREATE VIEW documents AS SELECT * FROM read_parquet('{out}/docs.parquet/*.parquet')")

# the capped jaccardCtes shape from QueryCatalog (cap = 10, threshold 0.5)
sql = r"""
WITH toks AS (
  SELECT doc_id AS id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk FROM documents),
sets AS (
  SELECT id,
    CASE WHEN len(tk) >= 3
      THEN list_distinct([array_to_string(tk[i + 1 : i + 3], ' ') FOR i IN range(0, len(tk) - 2)])
      ELSE list_distinct([array_to_string(tk, ' ')]) END AS sh
  FROM toks),
sized0 AS (SELECT id, len(sh) AS set_size, unnest(sh) AS shingle FROM sets),
keptsh AS (SELECT shingle FROM sized0 GROUP BY shingle HAVING count(*) <= 10),
sized AS (SELECT sized0.* FROM sized0 JOIN keptsh USING (shingle)),
cand AS (
  SELECT a.id AS id_a, b.id AS id_b, a.set_size AS size_a, b.set_size AS size_b, count(*) AS n_common
  FROM sized a JOIN sized b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2, 3, 4)
SELECT id_a, id_b, round(n_common / (size_a + size_b - n_common), 6) AS jaccard
FROM cand
WHERE n_common / (size_a + size_b - n_common) >= 0.5
ORDER BY id_a, id_b
"""
oracle = con.execute(sql).fetchall()
spark = con.execute(
    f"SELECT id_a, id_b, jaccard FROM read_parquet('{out}/pairs.parquet/*.parquet') "
    "ORDER BY id_a, id_b").fetchall()

hot_df = con.execute(
    "SELECT count(*) FROM documents WHERE text LIKE '%hotk0 hotk1 hotk2'").fetchone()[0]
assert hot_df > 10, f"drill precondition: hot shingle df {hot_df} must exceed cap 10"
assert len(oracle) > 0, "drill must produce pairs (planted corpus has near-dups)"
if oracle == spark:
    print(f"== capped-oracle drill OK: {len(oracle)} pairs identical, "
          f"hot-shingle df {hot_df} > cap 10 (cap binds) ==")
else:
    only_o = set(oracle) - set(spark)
    only_s = set(spark) - set(oracle)
    print(f"MISMATCH: oracle-only {len(only_o)} spark-only {len(only_s)}")
    for r in list(only_o)[:5]:
        print("  oracle-only", r)
    for r in list(only_s)[:5]:
        print("  spark-only", r)
    sys.exit(1)
