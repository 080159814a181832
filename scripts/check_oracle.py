#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares row count, schema (column names sorted), column TYPES (DESCRIBE of
the oracle vs the parquet read — the driver's hash is type-sensitive, so a
HUGEINT 24 != BIGINT 24 even when every value compares equal; see the r13
roll_moving post-mortem), and values (rows sorted, exact for non-floats,
1e-9-relative for floats).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t)), [cols[i] for i in order]


def vals_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b or str(a) == str(b)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    results = {}
    for name in sorted(oracle):
        qdir = Path(out_dir) / name
        status = {}
        try:
            got = con.execute(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            exp = con.execute(oracle[name])
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
            # DBAPI type codes collapse int widths; DESCRIBE gives the real
            # DuckDB types (BIGINT vs HUGEINT vs DECIMAL, FLOAT vs DOUBLE)
            dg = {r[0]: r[1] for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchall()}
            de = {r[0]: r[1] for r in con.execute(f"DESCRIBE {oracle[name]}").fetchall()}
            g_rows, g_cols = canon(got_rows, got_cols)
            e_rows, e_cols = canon(exp_rows, exp_cols)
            status["rows"] = len(g_rows) == len(e_rows)
            status["schema"] = g_cols == e_cols
            type_diffs = {c: [dg.get(c), de.get(c)]
                          for c in set(dg) | set(de) if dg.get(c) != de.get(c)}
            status["types"] = not type_diffs
            if type_diffs:
                status["type_diff"] = type_diffs
            match = status["rows"] and status["schema"] and status["types"]
            if match:
                for gr, er in zip(g_rows, e_rows):
                    if not all(vals_eq(a, b) for a, b in zip(gr, er)):
                        match = False
                        status["first_diff"] = {"got": [str(x) for x in gr], "exp": [str(x) for x in er]}
                        break
            else:
                status["got"] = {"n": len(g_rows), "cols": g_cols}
                status["exp"] = {"n": len(e_rows), "cols": e_cols}
            status["match"] = match
        except Exception as e:  # noqa: BLE001
            status = {"match": False, "error": str(e)[:300]}
        results[name] = status
        print(("PASS " if status.get("match") else "FAIL "), name,
              "" if status.get("match") else json.dumps({k: v for k, v in status.items() if k != "match"})[:400])
    n_ok = sum(1 for s in results.values() if s.get("match"))
    print(f"\n{n_ok}/{len(results)} queries match")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
