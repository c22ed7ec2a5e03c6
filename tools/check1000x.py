#!/usr/bin/env python3
"""1000x oracle-gate runner: tools/check.py's exact compare, plus the
two adaptations the 600M-row tier needs.

 1. DuckDB memory cap + disk spill (DUCKDB_MEMORY_LIMIT, default 24GB)
    so a heavy oracle spills instead of OOM-killing the box.
 2. The collapse-first dedup_substring twin. The monolithic oracle was
    MEASURED OOM-killed at 130 GB RSS in r15 (SCALE1000.md): it
    materializes per-DOC gram and char streams (5M docs x ~280 grams +
    ~300 chars each). Identical normalized texts have identical
    excisions -- that is a THEOREM about the operator's semantics, not
    an engine implementation detail -- so the twin collapses to the
    ~5k unique texts first (one GROUP BY over the docs), runs the SAME
    independently-formulated ASOF per-char coverage recount per unique
    text, and expands by one fingerprint join. The part that could
    disagree with the engine (dup-gram df semantics, coverage merge,
    reassembly order) stays formulation-different; only the trivial
    dedup of identical inputs is shared. RSS is bounded by unique-text
    cardinality regardless of corpus depth.

Usage: python3 tools/check1000x.py /tmp/sf1000x <verifyOutDir>
(The out dir's oracle_sql.json is rewritten with the substring
override before the compare -- Verify regenerates it every run.)
"""
import json, os, sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check

SUBSTR_COLLAPSED = """\
WITH d AS (SELECT doc_id,
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
  FROM documents),
u AS (SELECT md5(t) AS fp, MIN(t) AS t, COUNT(*) AS w
      FROM d GROUP BY md5(t)),
g AS (SELECT fp, i, md5(substr(t, CAST(i AS INTEGER), 20)) AS h
      FROM u, UNNEST(generate_series(1, len(t) - 19)) AS s0(i)
      WHERE len(t) >= 20),
dup AS (SELECT h FROM (SELECT h, SUM(w) AS c
                       FROM (SELECT DISTINCT fp, h FROM g) dg
                       JOIN u USING (fp) GROUP BY h) WHERE c >= 2),
s AS (SELECT fp, i FROM g JOIN dup USING (h)),
chars AS (SELECT fp, p, substr(t, CAST(p AS INTEGER), 1) AS ch
          FROM u, UNNEST(generate_series(1, len(t))) AS c0(p)),
cov AS (SELECT c.fp, c.p, c.ch, s.i AS last_start
        FROM chars c ASOF LEFT JOIN s
          ON s.fp = c.fp AND s.i <= c.p),
x AS (SELECT fp,
        COALESCE(string_agg(ch, '' ORDER BY p)
          FILTER (WHERE last_start IS NULL OR p >= last_start + 20), '')
          AS clean_text,
        CAST(COUNT(*) FILTER (WHERE last_start IS NOT NULL
                                AND p < last_start + 20) AS BIGINT)
          AS n_removed
      FROM cov GROUP BY 1)
SELECT m.doc_id,
  COALESCE(x.clean_text, '') AS clean_text,
  COALESCE(x.n_removed, 0) AS n_removed
FROM (SELECT doc_id, md5(t) AS fp FROM d) m
LEFT JOIN x USING (fp)"""


def main(sf_dir, out_dir):
    os.environ.setdefault("DUCKDB_MEMORY_LIMIT", "24GB")
    path = f"{out_dir}/oracle_sql.json"
    oracles = json.load(open(path))
    for name in ("dedup_substring", "dedup_substring_xx"):
        if name in oracles:
            oracles[name] = SUBSTR_COLLAPSED
    json.dump(oracles, open(path, "w"), indent=1)
    check.main(sf_dir, out_dir)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
