"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 on Spark, the matching
``oracle_sql()`` on DuckDB over the same parquet views, and compares
row count, column names, and order-insensitive values (columns sorted
by name, rows sorted, exact equality for ints/strings, equality for
floats after the queries' own rounding discipline).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    problems = []
    if len(a) != len(b):
        problems.append(f"row count {len(a)} vs {len(b)}")
    if sorted(a.columns) != sorted(b.columns):
        problems.append(f"columns {sorted(a.columns)} vs {sorted(b.columns)}")
        return problems
    if problems:
        return problems
    a, b = normalize(a), normalize(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype(float)
            bv = bv.astype(float)
            bad = ~(np.isclose(av, bv, rtol=0, atol=0, equal_nan=True))
            exact_bad = int(bad.sum())
            close_bad = int((~np.isclose(av, bv, rtol=1e-12, atol=1e-9, equal_nan=True)).sum())
            if exact_bad:
                i = int(np.argmax(bad))
                problems.append(
                    f"col {c}: {exact_bad} exact mismatches ({close_bad} beyond 1e-12) "
                    f"e.g. row {i}: {av[i]!r} vs {bv[i]!r}"
                )
        else:
            if not (av == bv).all():
                bad = av != bv
                i = int(np.argmax(bad))
                problems.append(
                    f"col {c}: {int(bad.sum())} mismatches e.g. row {i}: {av[i]!r} vs {bv[i]!r}"
                )
    return problems


def main() -> int:
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print("usage: check_oracle.py [--json OUT.json] [sf_dir] [query ...]")
            return 2
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    import __spark_entry__ as E
    from spartan2_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, os_ = E.queries(), E.oracle_sql()
    unknown = [n for n in only if n not in qs]
    if unknown:
        print(f"UNKNOWN query name(s): {unknown} — not in queries()")
        return 2
    failed = []
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error {exc}")
            failed.append(name)
            report[name] = {"rows": None, "value_exact": False,
                            "err": f"spark: {exc}"[:300]}
            continue
        if name not in os_:
            print(f"SKIP {name}: rows-only ({len(sdf)} rows)")
            report[name] = {"rows": len(sdf), "value_exact": None,
                            "err": "no_oracle"}
            continue
        try:
            odf = con.execute(os_[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {exc}")
            failed.append(name)
            report[name] = {"rows": len(sdf), "value_exact": False,
                            "err": f"duckdb: {exc}"[:300]}
            continue
        problems = compare(sdf, odf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
            report[name] = {"rows": len(sdf), "value_exact": False,
                            "err": "; ".join(problems)[:300]}
        else:
            print(f"OK   {name} ({len(sdf)} rows)")
            report[name] = {"rows": len(sdf), "value_exact": True, "err": None}
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump({"sf_dir": sf_dir, "n_queries": len(report),
                       "n_failures": len(failed), "results": report}, fh,
                      indent=1)
        print(f"wrote {json_out}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
