"""Driver-twin correctness sweep: run EVERY catalog query through
Spark AND its DuckDB oracle at an arbitrary scale factor (the driver's
CORRECTNESS gate caps at 50 entries; this covers the other ~170).

Usage: python tools/sweep_oracle.py [sf_dir] [name_filter ...]
Prints one line per query (ok/FAIL) and a final summary; exit code 1
on any failure.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from mapreduce_itwiki_spark.plans import catalog  # noqa: E402
from mapreduce_itwiki_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _normalize(rows, columns):
    out = []
    for row in rows:
        cells = []
        for c in columns:
            v = row[c]
            if isinstance(v, float):
                cells.append("nan" if math.isnan(v) else f"{v + 0.0:.9g}")
            elif v is None:
                cells.append("∅")
            else:
                cells.append(str(v))
        out.append(tuple(cells))
    out.sort()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]
    spark = get_spark("sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, oracles = catalog.queries(), catalog.oracles()
    names = [n for n in qs if not name_filter or any(f in n for f in name_filter)]
    failures = []
    for i, name in enumerate(names):
        try:
            sdf = qs[name](spark, sf_dir)
            srows = [r.asDict() for r in sdf.collect()]
            if name not in oracles:
                print(f"[{i + 1}/{len(names)}] {name}: rows-only ({len(srows)})")
                continue
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = [dict(zip(ocols, row)) for row in res.fetchall()]
            ok = (
                sorted(sdf.columns) == sorted(ocols)
                and len(srows) == len(orows)
                and len(orows) > 0
                and _normalize(srows, sorted(ocols)) == _normalize(orows, sorted(ocols))
            )
        except Exception as e:  # noqa: BLE001 — sweep must report, not die
            ok, srows, orows = False, [], [("err", str(e)[:200])]
        status = "ok" if ok else "FAIL"
        print(f"[{i + 1}/{len(names)}] {name}: {status} ({len(srows)} rows)")
        if not ok:
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} pass; failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
