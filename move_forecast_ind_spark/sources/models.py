"""Model artifact source/sink (SURVEY.md §2.1 S4/S6).

The reference persists 110 Prophet models as individual pickle files named
``prophet_model_<Branch>.pkl`` and reloads them at startup by globbing the
directory and parsing branch names out of filenames (reference
main.py:169-185, pretrain_models.py:31-32).

Spark-first: the registry IS a table — one row per branch with the
coefficient array (plans.training.MODEL_SCHEMA). Persisted as parquet,
reloaded as a broadcastable DataFrame; no filename parsing, no glob, no
pickle. For parity with the filename-keyed layout, :func:`branch_from_path`
shows the S4 ``regexp_extract(input_file_name())`` mapping used when models
DO arrive as files on object storage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def save_registry(models: DataFrame, path: str) -> None:
    """S6 sink: the whole registry in one parquet write (models are rows,
    not files)."""
    models.write.mode("overwrite").parquet(path)


def load_registry(spark: SparkSession, path: str) -> DataFrame:
    """S4 source: reload for scoring; callers broadcast it into the join."""
    return spark.read.parquet(path)


def branch_from_path(file_col: Column) -> Column:
    """The reference's filename→branch parse (main.py:173
    ``splitext(basename(p))[0].replace("prophet_model_","")``) as a column
    expression over ``input_file_name()`` — for file-per-model layouts."""
    return F.regexp_extract(file_col, r"prophet_model_([^/]+)\.pkl$", 1)
