"""Driver-conditions sweep: every registered oracle-bearing query on a
VANILLA SparkSession (the driver's posture — none of get_spark's builder
confs), compared against its DuckDB oracle with the driver's exact
normalize-and-compare.

Why this exists (round 10): tools/check_oracle.py and the pytest suite
both run on the tuned ``get_spark`` builder. Queries must not depend on
any builder-level conf — ``session.tune`` / ``sources.load_table`` set
everything runtime-settable inside the query path — and the only way to
PROVE that is to sweep under the driver's own session shape. The round-10
front was rehearsed this way (50/50 green) before rotation; this tool
generalizes the rehearsal to the whole registry.

    python tools/vanilla_sweep.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    from check_oracle import normalize, run_oracle, run_spark_query

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    # vanilla: exactly what the grading driver builds
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from move_forecast_ind_spark.queries import REGISTRY

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    names = args.names or [n for n in REGISTRY if REGISTRY[n].oracle is not None]
    fails: list[str] = []
    for n in names:
        spec = REGISTRY[n]
        try:
            cols, types, rows = run_spark_query(spark, spec, args.sf)
            s_schema, s_rows = normalize(cols, types, rows)
            o_schema, o_rows = normalize(*run_oracle(con, spec.oracle))
            ok = (
                s_schema == o_schema
                and len(s_rows) == len(o_rows)
                and all(a == b for a, b in zip(s_rows, o_rows))
            )
            print(("PASS " if ok else "FAIL "), n, len(s_rows), flush=True)
            if not ok:
                fails.append(n)
        except Exception as ex:  # noqa: BLE001 — report and continue
            print("ERR  ", n, repr(ex)[:200], flush=True)
            fails.append(n)
    print(f"\n{len(names) - len(fails)}/{len(names)} green; fails: {fails}")
    raise SystemExit(1 if fails else 0)


if __name__ == "__main__":
    main()
