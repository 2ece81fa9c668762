#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares row count, sorted-column schema, and a hash of all values with
columns sorted by name and rows sorted.
"""
import json, sys, hashlib, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols = [c.lower() for c in spark_rel.columns]
            s_rows = spark_rel.fetchall()
            duck_rel = con.sql(sql)
            d_cols = [c.lower() for c in duck_rel.columns]
            d_rows = duck_rel.fetchall()
            problems = []
            # Uncast DuckDB integer aggregates (SUM(int) -> HUGEINT) reach
            # Arrow as decimal128 and hash-mismatch Spark's BIGINT even when
            # values are equal. Oracles must CAST; enforce it here.
            for c, t in zip(duck_rel.columns, duck_rel.types):
                ts = str(t).upper()
                if "HUGEINT" in ts or ts.startswith("DECIMAL"):
                    problems.append(f"oracle col {c} has type {ts}: add CAST")
            if sorted(s_cols) != sorted(d_cols):
                problems.append(f"schema {sorted(s_cols)} vs {sorted(d_cols)}")
            if len(s_rows) != len(d_rows):
                problems.append(f"rows {len(s_rows)} vs {len(d_rows)}")
            if not problems:
                hs = table_hash(s_cols, s_rows)
                hd = table_hash(d_cols, d_rows)
                if hs != hd:
                    problems.append("hash mismatch")
                    # show first differing line for debugging
                    so = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                    do = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                    sl = sorted("|".join(norm(r[i]) for i in so) for r in s_rows)
                    dl = sorted("|".join(norm(r[i]) for i in do) for r in d_rows)
                    for a, b in zip(sl, dl):
                        if a != b:
                            problems.append(f"  spark: {a}")
                            problems.append(f"  duck : {b}")
                            break
            if problems:
                fail += 1
                print(f"FAIL {name}: " + "; ".join(problems[:1]))
                for p in problems[1:]:
                    print("   " + p)
            else:
                ok += 1
                print(f"OK   {name} ({len(s_rows)} rows)")
        except Exception as e:
            fail += 1
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:300]}")
    print(f"\n{ok} ok, {fail} failed")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
