#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Runs graft.Verify (already-compiled classes) at the given SF dir, then for
each query: loads our parquet output and the DuckDB-oracle result, sorts
columns by name, sorts rows, and hash-compares values — approximating the
driver's CORRECTNESS_r{N}.json check so mismatches surface before round end.
"""
import json, subprocess, sys, hashlib
from pathlib import Path

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path("/tmp/graft_verify")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
ONLY = set(sys.argv[2:])  # optional subset of query names


def canon(v):
    if isinstance(v, float):
        return f"{v:.10g}"
    return repr(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    if not ONLY or "--skip-run" not in ONLY:
        subprocess.run(["tools/run_class.sh", "graft.Verify", SF_DIR, str(OUT)],
                       check=True, capture_output=True, text=True)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    names = [n for n in sorted(oracle) if not ONLY or n in ONLY or "--skip-run" in ONLY]
    ok = fail = 0
    for name in names:
        if name.startswith("--"):
            continue
        spark_dir = OUT / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output")
            fail += 1
            continue
        try:
            srel = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'")
            scols = [d[0] for d in srel.description]
            srows = srel.fetchall()
            orel = con.sql(oracle[name])
            ocols = list(orel.columns)
            otypes = [str(t) for t in orel.types]
            orows = orel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            fail += 1
            continue
        # HUGEINT guard (r2's one failure): DuckDB widens sum(BIGINT) etc.
        # to INT128, whose canonicalization differs from Spark's LongType —
        # fail loudly even if values happen to compare equal, so the oracle
        # SQL gets an explicit CAST before the driver ever sees it.
        huge = [c for c, t in zip(ocols, otypes) if "HUGEINT" in t.upper()]
        if huge:
            print(f"FAIL {name}: oracle schema has INT128 column(s) {huge}; "
                  f"CAST them (e.g. AS BIGINT/DOUBLE) in the oracle SQL")
            fail += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            fail += 1
            continue
        hs, ho = table_hash(scols, srows), table_hash(ocols, orows)
        if hs != ho:
            print(f"FAIL {name}: hash mismatch ({len(srows)} rows)")
            so = sorted(range(len(scols)), key=lambda i: scols[i])
            oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
            sset = sorted("\x1f".join(canon(r[i]) for i in so) for r in srows)
            oset = sorted("\x1f".join(canon(r[i]) for i in oo) for r in orows)
            for a, b in zip(sset, oset):
                if a != b:
                    print(f"  spark:  {a[:200]}")
                    print(f"  oracle: {b[:200]}")
                    break
            fail += 1
        else:
            print(f"ok   {name} ({len(srows)} rows)")
            ok += 1
    print(f"== {ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
