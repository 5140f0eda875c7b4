"""Parquet lake table sources.

The reference funnels every read through ad-hoc SQL into pandas
(reference main.py:56-66 ``fetch_data``, precompute_percentages.py:96-103,
pretrain_models.py:9). Here the lake is parquet read lazily by Spark, so
Catalyst pushes filters and column pruning into the scan for free — the
explicit SELECT lists and WHERE clauses the reference hand-writes become
optimizer work (SURVEY.md §4).

At 100 TB the same call works unchanged: parquet scans split by row-group,
partition-pruned if the lake is laid out as ``.../table/year=.../part-*.parquet``,
and `spark.sql.files.maxPartitionBytes` (default 128 MB) bounds per-task input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize ``events.ts`` to session-timezone ``TimestampType`` for ANY
    physical parquet encoding the fixture has shipped with:

    - TIMESTAMP(NANOS) + ``nanosAsLong`` → epoch-nanos ``LongType`` →
      ``timestamp_micros(ts div 1000)``;
    - ``timestamp[us]`` with no UTC flag → ``TimestampNTZType`` →
      ``cast("timestamp")`` (the session tz is pinned UTC in session.py, so
      the cast is a wall-clock no-op and ``unix_micros`` is bit-exact);
    - already ``TimestampType`` → pass through.

    Downstream plans (windows, as-of join, ``unix_micros``) require plain
    TIMESTAMP; keeping the contract here means a testdata re-encode can
    never again fan out into query-level failures.
    """
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


# Catalog-style table cache: keyed by (session JVM identity, path). A
# metastore-backed deployment gets this for free from the catalog —
# re-resolving the same immutable parquet table re-reads its footer on
# the DRIVER every time (~0.1 s per call here; a real object store adds
# a round trip). The cached object is the LAZY DataFrame (an analyzed
# plan), never data: every action still scans storage, filters still
# push down, and two callers composing different queries over the same
# cached frame share nothing but metadata. Fixture tables are immutable
# for a session; a path whose files change mid-session would need an
# invalidation hook (the catalog analog: REFRESH TABLE).
#
# Two hazards this cache must manage (ADVICE r5):
# - eviction: entries for stopped sessions would otherwise accumulate for
#   the life of the process. load_table() evicts every key whose
#   applicationId differs from the calling session's — the cache is
#   deliberately single-session (test/driver processes use one session at
#   a time; alternating live sessions would merely re-read footers).
# - persist leak: the cached object is SHARED, so a caller that .cache()s
#   it substitutes an InMemoryRelation into every later load_table user.
#   Callers must .unpersist() when done (see tests/test_server.py's
#   fixture) or persist a derived frame (.select("*")) instead.
_TABLE_CACHE: dict[tuple[str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one lake table (filters/pruning push down).

    ``events.ts`` has shipped as both TIMESTAMP(NANOS) and plain
    ``timestamp[us]`` parquet across fixture generations;
    :func:`normalize_event_ts` maps every encoding to ``TimestampType`` so
    downstream plans see one stable column type.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    # applicationId (not Python object id) keys the session: a stopped
    # session's id() could be reused by the allocator and hand back a
    # DataFrame bound to a dead JVM.
    app_id = spark.sparkContext.applicationId
    stale = [k for k in _TABLE_CACHE if k[0] != app_id]
    for k in stale:
        del _TABLE_CACHE[k]
    key = (app_id, f"{sf_dir}/{name}.parquet")
    df = _TABLE_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            df = normalize_event_ts(df)
        _TABLE_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register lake tables as temp views for the SQL API."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
