"""Edge-list / label-map text sources (reference format) → DataFrames.

Reference semantics (GemsLab/KGist ``graph.py:68-153``): one ``s p o`` triple
per line with sequential edge ids in file order (duplicates keep distinct ids
and all count toward m), and one ``node l1 l2 ...`` line per node with the
label order preserved.

Edge/line ids must be *deterministic and equal to the file line number* —
candidate tie-breaking in the greedy search depends on first-seen order.
``zipWithIndex`` over a text source guarantees that (partition order follows
byte ranges); this is the one sanctioned RDD use in the engine, confined to
one-time text ingestion.  Parquet/Iceberg KG tables carry an explicit ``eid``
column instead (written by the stage-3 materializer), so the scale path never
needs it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType()),
        T.StructField("pred", T.StringType()),
        T.StructField("obj", T.StringType()),
        T.StructField("eid", T.LongType()),
    ]
)

LABELS_SCHEMA = T.StructType(
    [
        T.StructField("node", T.StringType()),
        T.StructField("labels", T.ArrayType(T.StringType())),
        T.StructField("line_no", T.LongType()),
    ]
)


def _numbered_lines(spark: SparkSession, path: str) -> DataFrame:
    schema = T.StructType(
        [T.StructField("value", T.StringType()), T.StructField("line_no", T.LongType())]
    )
    if os.path.isfile(path):
        # Local file (the reference text format is single-node-sized by
        # contract): read on the driver and hand Spark one Arrow batch.  The
        # RDD zipWithIndex route below leaves a Python-origin lineage, so
        # EVERY downstream scan of the loaded table pays Python
        # serialization — measured 10.7 s to load NELL vs ~1 s this way,
        # and it slowed all later jobs over the same table.
        import pandas as pd

        # match textFile's line semantics exactly: UTF-8, '\n' boundaries
        # with trailing '\r' stripped — str.splitlines() would also split on
        # \x0b/\x0c/\x85/  etc. and the locale encoding is not UTF-8
        # everywhere
        with open(path, encoding="utf-8") as f:
            data = f.read()
        lines = [l[:-1] if l.endswith("\r") else l for l in data.split("\n")]
        if lines and lines[-1] == "":
            lines.pop()  # trailing newline does not produce an empty record
        pdf = pd.DataFrame({"value": lines, "line_no": range(len(lines))})
        return spark.createDataFrame(pdf, schema)
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    return spark.createDataFrame(rdd, schema)


def load_triples(spark: SparkSession, path: str, delimiter: str = " ") -> DataFrame:
    """S1 — ``DataFrame[subj, pred, obj, eid]`` with eid = file line number."""
    lines = _numbered_lines(spark, path)
    parts = F.split(F.trim(F.col("value")), delimiter)
    return (
        lines.where(F.trim(F.col("value")) != "")
        .select(
            parts.getItem(0).alias("subj"),
            parts.getItem(1).alias("pred"),
            parts.getItem(2).alias("obj"),
            F.col("line_no").alias("eid"),
        )
    )


def load_labels(spark: SparkSession, path: str, delimiter: str = " ") -> DataFrame:
    """S2 — ``DataFrame[node, labels array<string>, line_no]`` (order-preserving)."""
    lines = _numbered_lines(spark, path)
    parts = F.split(F.trim(F.col("value")), delimiter)
    return (
        lines.where(F.trim(F.col("value")) != "")
        .select(
            parts.getItem(0).alias("node"),
            F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))).alias("labels"),
            F.col("line_no"),
        )
    )


def explode_labels(labels: DataFrame) -> DataFrame:
    """Exploded ``(node, label, pos)`` view; ``pos`` is the 0-based position of
    the label within the node's tuple (drives dictionary/tie-break order)."""
    return labels.select(
        "node", "line_no", F.posexplode_outer("labels").alias("pos", "label")
    )
