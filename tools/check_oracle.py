#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <verify_outdir> <sf_dir>

For each <name>/ parquet dir in verify_outdir, runs oracle_sql.json[name]
in DuckDB (tables registered as views over sf_dir parquet) and compares:
row count, column names (sorted), and values (rows sorted, column-name
order) — both exactly and with 1e-9 tolerance for floats.

Typed-exact mode (always on): the driver hashes the SERIALIZED oracle
values, so a DuckDB HUGEINT (sum of BIGINT) vs a Spark BIGINT is a hash
mismatch even when the Python ints compare equal. We compare the arrow
schemas of both sides and fail on any physical-type divergence.
"""
import json, sys, math
import duckdb

def arrow_types(reader_result):
    """Arrow schema as {col: type-string}, order-independent."""
    tbl = reader_result.arrow()
    return {f.name: str(f.type) for f in tbl.schema}

# DuckDB->arrow types the driver serializes identically to these Spark
# parquet types (timestamps differ only in tz annotation, which the
# driver's value hash does not carry).
EQUIV = [({"int64"}, {"int64"}),
         ({"timestamp[us]", "timestamp[us, tz=UTC]"},
          {"timestamp[us]", "timestamp[us, tz=UTC]"})]

def types_equal(a, b):
    if a == b:
        return True
    for sa, sb in EQUIV:
        if a in sa and b in sb or a in sb and b in sa:
            return True
    return False

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(out, key=lambda t: tuple(str(x) for x in t)), [cols[i] for i in order]

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            res = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            gtypes = arrow_types(res)
            got = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchall()
            gcols = [d[0] for d in con.description]
            etypes = arrow_types(con.execute(sql))
            exp = con.execute(sql).fetchall()
            ecols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        g, gc = canon(got, gcols)
        e, ec = canon(exp, ecols)
        if gc != ec:
            print(f"FAIL {name}: cols {gc} vs {ec}")
            n_fail += 1
            continue
        tbad = [(c, gtypes.get(c), etypes.get(c)) for c in gc
                if not types_equal(str(gtypes.get(c)), str(etypes.get(c)))]
        if tbad:
            print(f"FAIL {name}: types differ (spark vs oracle): {tbad}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        bad = exact_bad = 0
        first = None
        for rg, re_ in zip(g, e):
            if rg != re_:
                exact_bad += 1
                ok = all(
                    (isinstance(a, float) and isinstance(b, float)
                     and (math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
                          or (math.isnan(a) and math.isnan(b))))
                    or a == b
                    for a, b in zip(rg, re_))
                if not ok:
                    bad += 1
                    if first is None:
                        first = (rg, re_)
        if bad:
            print(f"FAIL {name}: {bad}/{len(g)} rows differ, e.g. {first[0]} vs {first[1]}")
            n_fail += 1
        elif exact_bad:
            print(f"WARN {name}: exact-hash would differ on {exact_bad}/{len(g)} rows (float ulps)")
            n_pass += 1
        else:
            print(f"PASS {name}: {len(g)} rows exact")
            n_pass += 1
    # queries without oracle: rows-only
    import os
    for d in sorted(os.listdir(outdir)):
        p = os.path.join(outdir, d)
        if os.path.isdir(p) and d not in oracle:
            n = con.execute(f"SELECT count(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
            print(f"INFO {d}: no oracle, rows={n}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
