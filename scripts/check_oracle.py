#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles: replays oracle_sql.json in
DuckDB against the same parquet corpus and diffs against the Spark parquet
dumps written by graft.Verify. Mirrors what the driver's t2 gate does
(column-name-sorted, row-sorted, value-hash compare)."""
import sys, os, glob, json, math
import duckdb

def canon(rows, cols):
    # sort columns by name, then rows by stringified values
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): vals.append("NaN")
                else: vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out

def norm_type(t):
    # normalize arrow types to the python-object classes the driver's
    # value-typed hash sees (arrow to_pylist): all int widths -> int, all
    # float widths -> float, but decimal128 stays Decimal (this is exactly
    # the class that failed q19/q21/t01 in round 1: HUGEINT vs int64)
    t = t.replace("large_string", "string").replace("large_binary", "binary")
    if t.startswith("timestamp"): return "timestamp"
    if t.startswith("list") or t.startswith("large_list"): return "list"
    if t.startswith(("int", "uint")): return "int"
    if t in ("float", "double", "float32", "float64", "halffloat"): return "float"
    if t.startswith("decimal"): return "decimal"
    return t

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"MISSING-SPARK {name}"); n_fail += 1; continue
        try:
            duck = con.execute(sql)
            dcols = [d[0] for d in duck.description]
            drows = duck.fetchall()
        except Exception as e:
            print(f"ORACLE-ERROR {name}: {e}"); n_fail += 1; continue
        sq = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        scols = [d[0] for d in sq.description]
        srows = sq.fetchall()
        # typed check (mirrors the driver's value-typed hash): compare arrow
        # types after canonical column ordering — a DuckDB HUGEINT/decimal128
        # vs Spark int64 mismatch fails the driver even when values are equal
        datype = {f.name: str(f.type) for f in con.execute(sql).arrow().schema}
        satype = {f.name: str(f.type) for f in
                  con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").arrow().schema}
        tmism = {c: (satype.get(c), datype.get(c)) for c in datype
                 if c in satype and norm_type(satype[c]) != norm_type(datype[c])}
        dc, dr = canon(drows, dcols)
        sc, sr = canon(srows, scols)
        if dc != sc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}"); n_fail += 1
        elif tmism:
            print(f"FAIL {name}: arrow type mismatch {tmism}"); n_fail += 1
        elif dr != sr:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
            for i, (a, b) in enumerate(zip(sr, dr)):
                if a != b:
                    print(f"  first diff at row {i}:\n   spark={a}\n   duck ={b}")
                    break
            else:
                if len(sr) != len(dr):
                    longer, tag = (sr, 'spark') if len(sr) > len(dr) else (dr, 'duck')
                    print(f"  extra {tag} row: {longer[min(len(sr),len(dr))]}")
        else:
            print(f"PASS {name} ({len(sr)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
