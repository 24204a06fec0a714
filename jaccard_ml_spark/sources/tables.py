"""Table schemas and readers.

The transcripts schema is fixed and explicit (never inferred) — the
authoritative shape from BASELINE.json ``input_hint``:
(conv_id:string, turn_idx:int, role:string, text:string, tool:string,
ts:timestamp). The reference fixes its input format the same way
(edge-list parser, ``/root/reference/src/utils.cuh:163-180``).

On a production cluster these are Iceberg tables
(``spark.read.format("iceberg").load("catalog.db.transcripts")``) and all
checkpoint tables below are Iceberg snapshots; in this sandbox the same
code paths read/write parquet directories (format is a parameter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
])

TRUTH_GROUPS_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("group_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
])


def read_transcripts(spark: SparkSession, path: str,
                     fmt: str = "parquet") -> DataFrame:
    """Read the transcripts table with the pinned schema."""
    reader = spark.read.format(fmt)
    if fmt == "parquet":
        reader = reader.schema(TRANSCRIPTS_SCHEMA)
    return reader.load(path)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one of the driver-generated testdata tables."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
