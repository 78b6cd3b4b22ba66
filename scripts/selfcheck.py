#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/selfcheck.py <verify_out_dir> <sf_dir>

Reads <verify_out_dir>/oracle_sql.json, registers the sf parquet tables
in DuckDB, runs each oracle, reads the corresponding Spark parquet
output, and compares: row count, column names (sorted), and a hash of
the sorted row values. Mirrors what the driver does for
CORRECTNESS_r{N}.json so oracle parity can be iterated locally.
"""
import sys, json, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            cur = con.execute(sql)
            orows = cur.fetchall()
            ocols = [d[0] for d in cur.description]
            cur2 = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            srows = cur2.fetchall()
            scols = [d[0] for d in cur2.description]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failed.append(name)
            continue
        # Type guard (r7 lesson): DuckDB returns HUGEINT — the type of an
        # uncast sum(BIGINT) — as a plain Python int, so the value-level
        # probe below cannot see it, yet the driver's hasher canonicalizes
        # HUGEINT differently from BIGINT and the hash diverges on equal
        # values. DESCRIBE the oracle and flag any declared column type
        # outside the trusted set before values are even compared.
        trusted = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT",
                   "VARCHAR", "BOOLEAN"}
        type_bad = False
        try:
            dcols = con.execute(f"DESCRIBE {sql}").fetchall()
            for cname, ctype, *_ in dcols:
                # Arrays are checked by ELEMENT type: a DOUBLE[] column
                # carries exactly the float-canonicalization hazard the
                # guard exists to catch; BIGINT[]/VARCHAR[] are fine.
                base = ctype.split("(")[0].strip().upper().rstrip("[]")
                if base not in trusted:
                    print(f"WARN {name}: oracle col '{cname}' has declared "
                          f"type {ctype} (outside trusted "
                          f"{{BIGINT,INTEGER,VARCHAR,BOOLEAN}}) — "
                          f"driver hash may diverge; CAST it")
                    type_bad = True
        except Exception as e:
            print(f"WARN {name}: DESCRIBE failed ({e}) — type guard skipped")
        # Canonicalization guard: the driver's hasher proved unstable on
        # DECIMAL/DATE/DOUBLE in round 1; only int/str (BIGINT/VARCHAR)
        # outputs are trusted. Warn loudly on anything else.
        for probe in (orows[:1] or [[]]):
            for i, v in enumerate(probe):
                if v is not None and not isinstance(v, (int, str)):
                    print(f"WARN {name}: oracle col '{ocols[i]}' has "
                          f"non-int/str type {type(v).__name__} — "
                          f"driver hash may diverge")
        for probe in (srows[:1] or [[]]):
            for i, v in enumerate(probe):
                if v is not None and not isinstance(v, (int, str)):
                    print(f"WARN {name}: spark col '{scols[i]}' has "
                          f"non-int/str type {type(v).__name__} — "
                          f"driver hash may diverge")
        ok_cols = sorted(ocols) == sorted(scols)
        ok_rows = len(orows) == len(srows)
        ok_hash = ok_cols and ok_rows and \
            table_hash(ocols, orows) == table_hash(scols, srows)
        if ok_hash and type_bad:
            failed.append(name)
            print(f"FAIL {name}: values match but oracle type outside "
                  f"trusted set — driver hash WILL diverge (see WARN above)")
        elif ok_hash:
            print(f"PASS {name}: {len(srows)} rows")
        else:
            failed.append(name)
            print(f"FAIL {name}: cols={ok_cols} rows={ok_rows} "
                  f"(oracle {len(orows)} vs spark {len(srows)})")
            if not ok_cols:
                print(f"     oracle cols: {sorted(ocols)}")
                print(f"     spark  cols: {sorted(scols)}")
            elif ok_rows:
                oset = {tuple(map(canon, r)) for r in orows}
                sset = {tuple(map(canon, r)) for r in srows}
                diff_o = list(oset - sset)[:3]
                diff_s = list(sset - oset)[:3]
                print(f"     only-in-oracle: {diff_o}")
                print(f"     only-in-spark : {diff_s}")
    # queries without oracle: rows-only check
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} oracle-checked queries pass")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
