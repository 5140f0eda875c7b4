"""10×-sf0.1 extrapolation probe: measure the heavy bench queries on a
~sf1 derived dataset (Spark AND DuckDB-oracle) to test the floor thesis —
if the sf0.1 Spark/DuckDB gap is scheduling floor, the ratio must FALL
as data grows, because the floor amortizes while both engines' data-path
costs scale.

The derived dataset is measurement input, not a fixture replacement:
10 id-shifted copies of each sf0.1 table, with document tokens salted
per copy (cross-copy texts dissimilar → dedup pair structure scales
linearly, vocabulary ×10) and event timestamps shifted 400 days per copy
(the co-activity graph grows by time extension, not bucket inflation).
Build it with the COPY statements in BASELINE.md's round-5 extrapolation
section, then:

    python tools/scaleup_probe.py [--dir /tmp/sfx1] [name ...]
"""

from __future__ import annotations

import argparse
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

    print(f"{'query':<28} {'spark_s':>8} {'duck_s':>8} {'ratio':>6}")
    for n in names:
        spec = REGISTRY[n]
        best = duck = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            spec.fn(spark, args.dir).count()
            best = min(best, time.perf_counter() - t0)
            if spec.oracle is not None:
                t0 = time.perf_counter()
                con.sql(f"SELECT COUNT(*) FROM ({spec.oracle})").fetchone()
                duck = min(duck, time.perf_counter() - t0)
        spark.catalog.clearCache()
        r = best / duck if duck and duck != float("inf") else float("nan")
        print(f"{n:<28} {best:>8.2f} {duck:>8.2f} {r:>6.2f}")


if __name__ == "__main__":
    main()
