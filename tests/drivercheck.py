"""Strict driver-style correctness check (dtype-sensitive value hash).

Mimics the driver's CORRECTNESS gate more closely than test_queries.py's
``check_dtype=False`` comparison: columns sorted by name, rows sorted,
values hashed INCLUDING dtype — so an engine int64 vs oracle float64
(DuckDB HUGEINT sums) mismatches here exactly as it does in the driver.

Run standalone:  python tests/drivercheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def duck(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    h = hashlib.sha256()
    for c in df.columns:
        h.update(str(df[c].dtype).encode())
        h.update(pd.util.hash_pandas_object(df[c], index=False).values.tobytes())
    return h.hexdigest()


def check(name: str, sf_dir: str) -> tuple[bool, str]:
    import __ray_entry__ as e
    q, o = e.queries(), e.oracle_sql()
    got = to_df(q[name](sf_dir))
    want = duck(o[name], sf_dir)
    if sorted(got.columns) != sorted(want.columns):
        return False, f"schema {sorted(got.columns)} vs {sorted(want.columns)}"
    if len(got) != len(want):
        return False, f"rows {len(got)} vs {len(want)}"
    hg, hw = value_hash(got), value_hash(want)
    if hg != hw:
        gd = {c: str(got[c].dtype) for c in sorted(got.columns)}
        wd = {c: str(want[c].dtype) for c in sorted(want.columns)}
        return False, f"hash mismatch (dtypes got={gd} want={wd})"
    return True, "ok"


if __name__ == "__main__":
    import json

    import ray
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: drivercheck.py [sf_dir] [query ...] "
                  "[--json OUT.json]", file=sys.stderr)
            sys.exit(2)
        json_out = argv[i + 1]
        del argv[i:i + 2]
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    import __ray_entry__ as e
    oracles = e.oracle_sql()
    # default: EVERY queries() entry — SQL-checked when a twin exists,
    # rows-only (`no_oracle`) otherwise, mirroring the driver's own gate
    names = argv[1:] or sorted(e.queries())
    failed = 0
    results: dict[str, dict] = {}
    for n in names:
        if n in oracles:
            ok, msg = check(n, sf)
            results[n] = {"status": "PASS" if ok else "FAIL", "detail": msg,
                          "mode": "sql_strict_hash"}
            failed += not ok
        else:
            try:
                df = to_df(e.queries()[n](sf))
                results[n] = {"status": "PASS", "mode": "no_oracle",
                              "detail": f"rows={len(df)}"}
            except Exception as ex:  # noqa: BLE001 — recorded, not raised
                results[n] = {"status": "FAIL", "mode": "no_oracle",
                              "detail": repr(ex)[:200]}
                failed += 1
        r = results[n]
        print(f"{r['status']} {n}: {r['detail']}")
    if json_out:
        summary = {
            "sf_dir": sf,
            "n_queries": len(results),
            "n_sql_checked": sum(1 for r in results.values()
                                 if r["mode"] == "sql_strict_hash"),
            "n_pass": sum(1 for r in results.values()
                          if r["status"] == "PASS"),
            "n_fail": failed,
            "results": results,
        }
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1)
    ray.shutdown()
    sys.exit(1 if failed else 0)
