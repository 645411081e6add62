#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's DuckDB-oracle compare.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 tools/local_verify.py <sfDir> <outDir>

For each <outDir>/<name>/ parquet dir, runs <outDir>/oracle_sql.json[name]
in DuckDB (tables = views over <sfDir>/*.parquet), sorts columns by name,
sorts rows, and compares values cell-by-cell. NOT shipped library code.

With a SPARK_GRAFT_VERIFY_ONLY subset dump, names without a dump dir are
reported as `skip` (not FAIL) — only dumped entries are gated.
"""
import json, math, os, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return v

def frame(rel):
    df = rel.df()
    df = df[sorted(df.columns)]
    rows = [tuple(norm(v) for v in r) for r in df.itertuples(index=False)]
    return sorted(rows, key=repr), list(df.dtypes.astype(str))

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Under a SPARK_GRAFT_VERIFY_ONLY subset dump, only the requested names
    # are gated; in a full run a missing dump dir means the Verify dump
    # crashed or silently dropped the entry — that is a FAIL, not a skip.
    only_env = os.environ.get("SPARK_GRAFT_VERIFY_ONLY")
    only = set(n.strip() for n in only_env.split(",") if n.strip()) if only_env else None
    ok = fail = skipped = 0
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            if only is not None and name not in only:
                skipped += 1
            else:
                print(f"FAIL {name}: no dump dir under {out_dir}")
                fail += 1
            continue
        try:
            got, gt = frame(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
            want, wt = frame(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: {e}")
            fail += 1
            continue
        if got == want:
            print(f"ok   {name}: {len(got)} rows")
            ok += 1
        else:
            fail += 1
            print(f"FAIL {name}: spark {len(got)} rows {gt} vs oracle {len(want)} rows {wt}")
            for i, (g, w) in enumerate(zip(got, want)):
                if g != w:
                    print(f"  first diff row {i}:\n   spark : {g}\n   oracle: {w}")
                    break
            else:
                n = min(len(got), len(want))
                print(f"  row-count diff; first extra: {(got[n:n+1] or want[n:n+1])}")
    tail = f", {skipped} skipped (no dump)" if skipped else ""
    print(f"== {ok} ok, {fail} fail{tail}")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
