"""Local pre-driver correctness sweep: run EVERY __ray_entry__ query and
compare against its oracle_sql via DuckDB, mimicking the driver's
compare (row count + schema + exact value equality, columns sorted by
name, rows canonically sorted).  Usage:

    PYTHONPATH=/root/repo python tools/oracle_sweep.py [sf_dir]

Writes per-query status+timings to /tmp/sweep.json and prints one JSON
summary line.  The round-4 final run: 61/61 oracle-backed pass (+2
no-oracle by design), 63 queries, 243.6s wall at sf0.01 / 16 CPUs."""
import json
import sys
import time

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray

ray.init(address="local", num_cpus=16, include_dashboard=False,
         logging_level="ERROR")

sys.path.insert(0, "/root/repo")
import __ray_entry__ as e

ONLY = None
argv = list(sys.argv[1:])
if "--only" in argv:
    i = argv.index("--only")
    ONLY = set(argv[i + 1].split(","))
    del argv[i:i + 2]
SF = argv[0] if argv else "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")

qs, osql = e.queries(), e.oracle_sql()
if ONLY:
    missing = ONLY - set(qs)
    assert not missing, f"--only names not registered: {sorted(missing)}"
    qs = {k: v for k, v in qs.items() if k in ONLY}


def to_pandas(res):
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def canon(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    if len(df):
        # stable row sort over all columns (stringify unhashable cells)
        key = df.apply(
            lambda c: c.map(lambda v: str(v))
            if c.dtype == object else c.astype(str))
        order = np.lexsort([key[c].to_numpy() for c in reversed(key.columns)])
        df = df.iloc[order].reset_index(drop=True)
    return df


results = {}
for name in qs:
    t0 = time.time()
    # sec = total (engine + oracle + compare); ray_s / sql_s split the
    # two sides — round-5 session 4 found the dedup family's "slow"
    # sweep entries were 90% DuckDB recursive-CTE oracle time
    # misattributed to the engine by the combined timer.
    row = {"sec": None}
    try:
        got = canon(to_pandas(qs[name](SF)))
        row["ray_s"] = round(time.time() - t0, 2)
        row["rows"] = int(len(got))
        if name not in osql:
            row["status"] = "no_oracle"
        else:
            t1 = time.time()
            want = canon(con.execute(osql[name]).df())
            row["sql_s"] = round(time.time() - t1, 2)
            if list(got.columns) != list(want.columns):
                row["status"] = "SCHEMA_FAIL"
                row["detail"] = f"{list(got.columns)} vs {list(want.columns)}"
            elif len(got) != len(want):
                row["status"] = "ROWS_FAIL"
                row["detail"] = f"{len(got)} vs {len(want)}"
            else:
                bad = []
                for c in got.columns:
                    a, b = got[c], want[c]
                    if str(a.dtype) != str(b.dtype):
                        bad.append(f"{c}: dtype {a.dtype} vs {b.dtype}")
                        continue
                    if a.dtype == object:
                        eq = a.map(str).eq(b.map(str)).all()
                    elif np.issubdtype(a.dtype, np.floating):
                        av, bv = a.to_numpy(), b.to_numpy()
                        eq = np.array_equal(av, bv, equal_nan=True)
                        if not eq:
                            # bitwise check is the engine's contract
                            bad.append(f"{c}: float mismatch")
                            continue
                    else:
                        eq = a.equals(b)
                    if not eq:
                        bad.append(f"{c}: values")
                row["status"] = "pass" if not bad else "VALUE_FAIL"
                if bad:
                    row["detail"] = "; ".join(bad)
    except Exception as ex:  # noqa: BLE001
        row["status"] = "ERROR"
        row["detail"] = f"{type(ex).__name__}: {ex}"[:300]
    row["sec"] = round(time.time() - t0, 2)
    results[name] = row
    print(f"{name}: {row['status']} ({row['sec']}s)"
          + (f" -- {row.get('detail','')}" if row["status"] not in
             ("pass", "no_oracle") else ""), flush=True)

npass = sum(1 for r in results.values() if r["status"] == "pass")
print(json.dumps({"pass": npass, "total": len(results),
                  "no_oracle": sum(1 for r in results.values()
                                   if r["status"] == "no_oracle"),
                  "fail": {k: v for k, v in results.items()
                           if v["status"] not in ("pass", "no_oracle")}}))
with open("/tmp/sweep.json", "w") as f:
    json.dump(results, f, indent=1)
ray.shutdown()
