#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 correctness gate.

Runs DuckDB over the same parquet tables as `graft.Verify`'s output and
compares each query's Spark result (outDir/<name>/*.parquet) against its
oracle SQL (outDir/oracle_sql.json): column names (sorted), dtypes
(loosely), row count, and cell values.

Usage: tools/check.py [sfDir] [outDir]
"""
import duckdb, glob, json, math, os, sys

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = set(oracle) | {os.path.basename(p) for p in glob.glob(f"{outdir}/*") if os.path.isdir(p)}
    # the registered-query manifest catches a rows-only query that
    # failed to produce output (it has no oracle entry to flag it)
    manifest = f"{outdir}/queries.json"
    if os.path.exists(manifest):
        names |= set(json.load(open(manifest)))
    names = sorted(names)
    fails = 0
    for name in names:
        spark_glob = f"{outdir}/{name}/*.parquet"
        if not glob.glob(spark_glob):
            print(f"MISSING-SPARK {name}")
            fails += 1
            continue
        sq = con.sql(f"SELECT * FROM read_parquet('{spark_glob}')")
        scols, srows = sq.columns, sq.fetchall()
        if name not in oracle:
            print(f"ROWS-ONLY     {name}: {len(srows)} rows")
            continue
        try:
            oq = con.sql(oracle[name])
            ocols, orows = oq.columns, oq.fetchall()
        except Exception as e:
            print(f"ORACLE-ERR    {name}: {e}")
            fails += 1
            continue
        ok = True
        # dtype-class check: a value-aware hash distinguishes e.g.
        # DuckDB HUGEINT/DECIMAL from Spark BIGINT even when the values
        # are numerically equal (this exact class cost us events_window
        # and sessionize in round 1). Int widths hash the same; decimal
        # vs int/float, and timestamp unit, do not.
        def tclass(t):
            t = str(t).lower()
            if t.startswith("decimal") or t == "hugeint":
                return "decimal"
            if t in ("tinyint", "smallint", "integer", "bigint",
                     "utinyint", "usmallint", "uinteger", "ubigint"):
                return "int"
            return t
        # compare per-name type MULTISETS: duplicate column names keep
        # every occurrence (sorted within the name), and a name present
        # on only one side never silently skips the type check — it
        # falls through to COLS-MISMATCH below.
        def typemap(cols, types):
            m = {}
            for c, t in zip(cols, [tclass(t) for t in types]):
                m.setdefault(c, []).append(t)
            return {c: sorted(ts) for c, ts in m.items()}
        stypes, otypes = typemap(sq.columns, sq.types), typemap(oq.columns, oq.types)
        for c in sorted(set(stypes) & set(otypes)):
            if stypes[c] != otypes[c]:
                print(f"DTYPE-MISMATCH {name}: col {c} spark={stypes[c]} oracle={otypes[c]}")
                ok = False
        if sorted(scols) != sorted(ocols):
            print(f"COLS-MISMATCH {name}: spark={sorted(scols)} oracle={sorted(ocols)}")
            ok = False
        if len(srows) != len(orows):
            print(f"ROWS-MISMATCH {name}: spark={len(srows)} oracle={len(orows)}")
            ok = False
        if ok:
            si = [scols.index(c) for c in sorted(scols)]
            oi = [ocols.index(c) for c in sorted(ocols)]
            for rn, (a, b) in enumerate(zip(srows, orows)):
                av = tuple(norm(a[i]) for i in si)
                bv = tuple(norm(b[i]) for i in oi)
                if av != bv:
                    print(f"VAL-MISMATCH  {name} row {rn}:\n  spark ={av}\n  oracle={bv}")
                    ok = False
                    break
        if ok:
            print(f"OK            {name}: {len(srows)} rows")
        else:
            fails += 1
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
