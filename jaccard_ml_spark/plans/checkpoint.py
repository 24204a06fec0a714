"""Stage checkpointing, resume, lineage and metrics tables.

The reference caches its parsed CSR (``.met.bin``,
``/root/reference/src/utils.cuh:118-159``) and re-reads its output JSON
to resume finished experiments (``src/main.cu:69-74``). Here every
pipeline stage writes a versioned checkpoint table; a restarted job
detects completed stages and reads them instead of recomputing.

On a production cluster the store is an Iceberg catalog (atomic snapshot
commits give exactly-once stage completion); in this sandbox the same
protocol runs on parquet directories with an atomically-renamed
``_STAGE_COMPLETE`` marker. The public API is identical.

Two side tables per run:
  lineage  (run_id, stage, input_rows, output_rows, started_utc,
            seconds, partition_count)
  metrics  (run_id, key, value)
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class CheckpointStore:
    def __init__(self, spark: SparkSession, root: str, run_id: str = "run"):
        self.spark = spark
        self.root = root.rstrip("/")
        self.run_id = run_id
        os.makedirs(self.root, exist_ok=True)
        self._lineage: list[dict] = []
        self._metrics: list[dict] = []

    # -- stage protocol ----------------------------------------------
    def _dir(self, stage: str) -> str:
        return f"{self.root}/{stage}"

    def _marker(self, stage: str) -> str:
        return f"{self._dir(stage)}/_STAGE_COMPLETE"

    def has(self, stage: str) -> bool:
        return os.path.exists(self._marker(stage))

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._dir(stage))

    def write(self, stage: str, df: DataFrame,
              partition_by: list[str] | None = None) -> DataFrame:
        """Materialize a stage; atomic completion marker; returns the
        re-read DataFrame (truncates lineage like the reference's
        .met.bin reload)."""
        t0 = time.monotonic()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._dir(stage))
        out = self.read(stage)
        n = out.count()
        elapsed = time.monotonic() - t0
        tmp = self._marker(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"run_id": self.run_id, "stage": stage,
                       "rows": n, "seconds": elapsed}, f)
        os.replace(tmp, self._marker(stage))  # atomic completion commit
        self._lineage.append({
            "run_id": self.run_id, "stage": stage, "output_rows": n,
            "seconds": elapsed,
            "partition_count": out.rdd.getNumPartitions(),
        })
        return out

    def write_bucketed(self, stage: str, df: DataFrame,
                       bucket_cols: list[str], n_buckets: int = 16,
                       sort_cols: list[str] | None = None) -> DataFrame:
        """Materialize a stage hash-bucketed (and optionally sorted) by
        key — the reference's degree-sort data-layout pass
        (``/root/reference/src/utils.cuh:406-492``) as a Spark layout
        hook. A downstream equi-join on the bucket key reads this side
        WITHOUT an exchange (the fat side of the verify join is the
        shingle-set table; bucketing it by id means the arrays never
        re-shuffle — only the slim pair side moves). On Iceberg the
        same layout is ``bucket(N, id)`` partitioning + sort order.

        Uses saveAsTable (bucket metadata lives in the catalog; a plain
        parquet path cannot record bucketing).
        """
        t0 = time.monotonic()
        table = f"ckpt_{self.run_id}_{stage}".replace("-", "_")
        writer = (df.write.mode("overwrite").format("parquet")
                  .option("path", self._dir(stage))
                  .bucketBy(n_buckets, *bucket_cols))
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        self.spark.sql(f"DROP TABLE IF EXISTS {table}")
        writer.saveAsTable(table)
        out = self.spark.table(table)
        n = out.count()
        elapsed = time.monotonic() - t0
        tmp = self._marker(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"run_id": self.run_id, "stage": stage,
                       "rows": n, "seconds": elapsed,
                       "bucketed_by": bucket_cols,
                       "n_buckets": n_buckets}, f)
        os.replace(tmp, self._marker(stage))
        self._lineage.append({
            "run_id": self.run_id, "stage": stage, "output_rows": n,
            "seconds": elapsed,
            "partition_count": out.rdd.getNumPartitions(),
        })
        return out

    def stage(self, name: str, build) -> DataFrame:
        """Resume-or-compute: the core protocol.

        ``build`` is a zero-arg callable returning the stage DataFrame;
        it is only invoked when the stage has not completed.
        """
        if self.has(name):
            self._metrics.append(
                {"run_id": self.run_id, "key": f"{name}.resumed",
                 "value": 1.0})
            return self.read(name)
        return self.write(name, build())

    # -- side tables ---------------------------------------------------
    def metric(self, key: str, value: float) -> None:
        self._metrics.append(
            {"run_id": self.run_id, "key": key, "value": float(value)})

    def flush_tables(self) -> None:
        if self._lineage:
            self.spark.createDataFrame(self._lineage).write.mode(
                "append").parquet(f"{self.root}/_lineage")
        if self._metrics:
            self.spark.createDataFrame(self._metrics).write.mode(
                "append").parquet(f"{self.root}/_metrics")
        self._lineage, self._metrics = [], []
