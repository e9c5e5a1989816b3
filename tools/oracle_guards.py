#!/usr/bin/env python3
"""Planted-group probe of the oracle-side zero-variance guards.

Exercises the DuckDB half of the guard paths that ZeroCanonSpec pins on
the Spark half: a constant-valued event_type group must yield SQL NULL
(not IEEE NaN/Inf) for q_moments skewness/kurtosis, and an all-zero-gap
user must yield NULL burstiness. Also proves the negative-zero
canonicalizer: DuckDB round(-eps) is -0.0, and the oracles' `+ 0` maps
it to +0.0 (bit-identical to Spark's output).

Usage: python3 tools/oracle_guards.py <verifyOutDir-with-oracle_sql.json>
Builder-side tooling only — not part of the shipped library.
"""
import json, os, struct, sys

import duckdb


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    sql = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()

    # -0.0 canonicalization primitive
    neg = con.execute("SELECT round(-1e-9, 6)::DOUBLE").fetchone()[0]
    canon = con.execute("SELECT round(-1e-9, 6) + 0::DOUBLE").fetchone()[0]
    assert struct.pack("<d", neg) == struct.pack("<d", -0.0), "DuckDB round must preserve -0.0"
    assert struct.pack("<d", canon) == struct.pack("<d", 0.0), "+ 0 must canonicalize to +0.0"

    con.execute("""
        CREATE TABLE events AS
        SELECT * FROM (VALUES
          (1, 10, TIMESTAMP '2024-01-01 00:00:00', 'const', 7.25, '{}'),
          (2, 10, TIMESTAMP '2024-01-01 00:00:00', 'const', 7.25, '{}'),
          (3, 10, TIMESTAMP '2024-01-01 00:00:00', 'const', 7.25, '{}'),
          (4, 20, TIMESTAMP '2024-01-01 00:00:01', 'varied', 1.0, '{}'),
          (5, 20, TIMESTAMP '2024-01-01 00:00:03', 'varied', 2.0, '{}'),
          (6, 20, TIMESTAMP '2024-01-01 00:00:09', 'varied', 4.0, '{}')
        ) AS t(event_id, user_id, ts, event_type, value, payload)
    """)

    moments = {r[0]: r for r in con.execute(sql["q_moments"]).fetchall()}
    assert moments["const"][4] is None, "constant group skewness must be SQL NULL"
    assert moments["const"][5] is None, "constant group kurtosis must be SQL NULL"
    assert moments["varied"][4] is not None and moments["varied"][5] is not None

    burst = {r[0]: r for r in con.execute(sql["q_burstiness"]).fetchall()}
    assert burst[10][3] is None, "all-zero-gap burstiness must be SQL NULL"
    assert burst[20][3] is not None

    print("oracle guard probes: all pass (moments + burstiness NULL on "
          "planted constant groups; round(-eps)+0 canonicalizes)")


if __name__ == "__main__":
    main()
