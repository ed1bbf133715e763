#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [--json <artifact>]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same sf tables,
sorts columns by name and rows by all columns, and compares values exactly
(floats to 15 significant digits). Dev tool only — the engine itself is pure
Scala/Spark.

TYPE-STRICT (round-12): besides values, compares DuckDB's DECLARED result
type of every oracle column against the type DuckDB assigns the Spark parquet
dump. Round 11 shipped three oracles whose bare integer sum() DuckDB typed
HUGEINT while Spark emitted BIGINT — values identical, so the old pandas
normalization passed locally, but the driver's type-aware hash failed. Any
declared-type mismatch is now [FAIL-type] even when all values match.
"""
import json, math, sys, glob, os
import duckdb

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.15g}"
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return str(v)

def decl_types(con, sql):
    """Column -> DuckDB-declared type for a query, via DESCRIBE (no execution)."""
    return {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}

# The driver's hash renders TINYINT..BIGINT identically (python ints), so
# width differences inside the 64-bit integer family are benign — r11 had 19
# green queries with INTEGER-vs-BIGINT declared types. What it CANNOT absorb
# is a family change: HUGEINT (pandas object), DECIMAL (Decimal), FLOAT
# (float32 precision) against BIGINT/DOUBLE. Compare type FAMILIES.
def type_family(t):
    t = t.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "INT64"
    if t.startswith("DECIMAL"):
        return "DECIMAL"
    return t  # HUGEINT, UBIGINT, DOUBLE, FLOAT, VARCHAR, DATE, ... distinct

def main(sf_dir, out_dir, json_out=None):
    results = {}
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        # driver testdata ships single parquet FILES; ScaleGen dirs are
        # Spark-written DIRECTORIES of part files — glob those
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchdf()
        def record(rows_m, schema_m, hash_m, oracle_rows, err):
            results[name] = {
                "rows_match": rows_m, "schema_match": schema_m,
                "hash_match": hash_m, "spark_rows": len(got),
                "oracle_rows": oracle_rows, "err": err}
        if name not in oracle:
            print(f"[rows-only] {name}: {len(got)} rows")
            record(None, None, None, None, "no_oracle")
            continue
        exp = con.execute(oracle[name]).fetchdf()
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"[FAIL-schema] {name}: spark={gcols} duck={ecols}")
            record(None, False, None, len(exp), "schema")
            n_fail += 1
            continue
        gt = decl_types(con, f"SELECT * FROM read_parquet('{d}/*.parquet')")
        et = decl_types(con, oracle[name])
        bad_t = [(c, gt[c], et[c]) for c in gcols
                 if type_family(gt[c]) != type_family(et[c])]
        if bad_t:
            print(f"[FAIL-type] {name}: " + ", ".join(
                f"{c}: spark={a} duck={b}" for c, a, b in bad_t))
            record(None, False, None, len(exp), "type")
            n_fail += 1
            continue
        g = [tuple(norm(v) for v in row) for row in got[gcols].itertuples(index=False)]
        e = [tuple(norm(v) for v in row) for row in exp[ecols].itertuples(index=False)]
        g.sort(); e.sort()
        if g == e:
            print(f"[PASS] {name}: {len(g)} rows")
            record(True, True, True, len(e), None)
            n_pass += 1
        else:
            n_fail += 1
            print(f"[FAIL-values] {name}: {len(g)} spark rows vs {len(e)} duck rows")
            record(len(g) == len(e), True, False, len(e), "values")
            diff_g = [r for r in g if r not in set(e)][:3]
            diff_e = [r for r in e if r not in set(g)][:3]
            print(f"  spark-only: {diff_g}")
            print(f"  duck-only:  {diff_e}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(dict(sorted(results.items())), f, indent=2)
        print(f"[artifact] {json_out}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    args = sys.argv[1:]
    jo = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            sys.exit("usage: oracle_check.py <sfDir> <verifyOutDir> [--json <artifact>]")
        jo = args[i + 1]
        args = args[:i] + args[i + 2:]
    if len(args) < 2:
        sys.exit("usage: oracle_check.py <sfDir> <verifyOutDir> [--json <artifact>]")
    sys.exit(main(args[0], args[1], jo))
