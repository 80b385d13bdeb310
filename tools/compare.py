#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result, run
the oracle SQL (oracle_sql.json) in DuckDB with each testdata parquet
registered as a view, sort columns by name, and compare row count, column
names, and a hash of the values.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def dtype_kind(dt) -> str:
    """Coarse dtype class that changes how values render in the driver's
    hasher: int vs float vs bool vs everything-else. DuckDB HUGEINT (any
    windowed SUM of BIGINT) lands in pandas as float64 and hashes
    differently from Spark's int64 EVEN WHEN THE VALUES ARE EQUAL — the
    r4 ev_sessions and r17 q27/q30/q32 failure class. Hashing the kind
    makes the local gate fail exactly where the driver would."""
    k = getattr(dt, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    return "obj"


def values_hash(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.sha256()
    # Per-column dtype kinds participate in the hash: a float64 column of
    # integral values is NOT equal to an int64 column under the driver.
    for c in df.columns:
        h.update(dtype_kind(df[c].dtype).encode())
        h.update(b",")
    h.update(b"\n")
    for _, row in df.iterrows():
        for v in row:
            if isinstance(v, float):
                h.update(f"{v:.9g}".encode())
            else:
                h.update(str(v).encode())
            h.update(b"|")
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    import glob
    import os
    n_pass = n_fail = n_rowsonly = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        spark_df = pd.read_parquet(qdir)
        if name not in oracles:
            print(f"ROWSONLY {name}: rows={len(spark_df)}")
            n_rowsonly += 1
            continue
        try:
            ora_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        s, o = canon(spark_df), canon(ora_df)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} oracle={list(o.columns)}")
            n_fail += 1
            continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
            n_fail += 1
            continue
        kinds_s = [dtype_kind(s[c].dtype) for c in s.columns]
        kinds_o = [dtype_kind(o[c].dtype) for c in o.columns]
        if kinds_s != kinds_o:
            diffs = [f"{c}: spark {ks} vs oracle {ko}"
                     for c, ks, ko in zip(s.columns, kinds_s, kinds_o) if ks != ko]
            print(f"FAIL {name}: dtype kind mismatch — {'; '.join(diffs)}")
            n_fail += 1
            continue
        hs, ho = values_hash(s), values_hash(o)
        if hs != ho:
            print(f"FAIL {name}: hash mismatch ({len(s)} rows)")
            # show first differing rows
            for i in range(len(s)):
                rs, ro = list(s.iloc[i]), list(o.iloc[i])
                same = all(
                    (f"{a:.9g}" == f"{b:.9g}") if isinstance(a, float) and isinstance(b, float)
                    else str(a) == str(b)
                    for a, b in zip(rs, ro))
                if not same:
                    print(f"  row {i}: spark={rs}")
                    print(f"  row {i}: oracle={ro}")
                    break
            n_fail += 1
        else:
            print(f"PASS {name}: {len(s)} rows")
            n_pass += 1
    print(f"\n== pass={n_pass} fail={n_fail} rowsonly={n_rowsonly}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
