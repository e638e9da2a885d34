"""Per-stage checkpoint + lineage + resume (north rule: "resumable
from checkpoint with per-partition lineage + metrics so a killed run
resumes without reprocessing completed cell groups").

A stage's work is partitioned into UNITS (coarse quadtree cell groups
— `unit_col`, e.g. parent_at(cell_id, 3)). One run:

  1. pending = distinct units − units already recorded done in the
     lineage log (an anti-join against the manifest, SURVEY §4.2.5)
  2. ONE Spark job processes every pending unit (filter + transform —
     no per-unit driver loop)
  3. output lands in <root>/<stage>/unit=<u>/ via partitionBy; the
     unit directory is only marked done in the lineage log AFTER its
     files are fully written, so a kill mid-job re-runs only the
     units whose records never landed
  4. per-unit lineage record: rows, wall seconds, input fingerprint

Idempotence: partitionBy dirs for a unit are overwritten
(dynamic partition overwrite) on re-run, so a partially-written unit
from a killed job is replaced wholesale, never double-counted.

This mirrors the reference's rollback chain + ISS progress events
(es6-lib/services/spatial.js:52-57,411-425; upstream/iss.js:95-140)
re-expressed as idempotent restart instead of rollback.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointedStage:
    def __init__(self, root: str, stage: str):
        self.root = root
        self.stage = stage
        self.stage_dir = os.path.join(root, stage)
        self.lineage_path = os.path.join(root, f"{stage}.lineage.jsonl")
        os.makedirs(self.stage_dir, exist_ok=True)

    # -- lineage -------------------------------------------------------------

    def lineage(self) -> list[dict]:
        if not os.path.exists(self.lineage_path):
            return []
        with open(self.lineage_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def completed_units(self) -> set:
        return {r["unit"] for r in self.lineage() if r["status"] == "done"}

    def _record(self, rec: dict) -> None:
        with open(self.lineage_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    # -- run -----------------------------------------------------------------

    def run(
        self,
        spark: SparkSession,
        df: DataFrame,
        unit_col: str,
        transform,
        input_fingerprint: str = "",
    ) -> dict:
        """Process all not-yet-done units of `df` through `transform`
        (DataFrame -> DataFrame, must keep unit_col). Returns a
        summary {units_run, units_skipped, rows}."""
        done = self.completed_units()
        all_units = [r[0] for r in df.select(unit_col).distinct().collect()]
        pending = [u for u in all_units if u not in done]
        if not pending:
            return {"units_run": 0, "units_skipped": len(done), "rows": 0}

        t0 = time.time()
        part = df.filter(F.col(unit_col).isin(pending))
        out = transform(part)
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(unit_col)
            .parquet(self.stage_dir)
        )
        # per-unit row counts for lineage (reads back manifest-cheap;
        # explicit schema so an all-rows-filtered stage — zero files
        # written — still reads as empty instead of failing inference)
        counts = {
            r[0]: r[1]
            for r in spark.read.schema(out.schema).parquet(self.stage_dir)
            .filter(F.col(unit_col).isin(pending))
            .groupBy(unit_col)
            .count()
            .collect()
        }
        wall = time.time() - t0
        # All pending units share ONE Spark job/timer; per-unit wall is
        # the amortized share, with the batch total carried alongside
        # (recording the batch wall per unit would overstate cost x
        # len(pending) in the metrics table).
        for u in pending:
            self._record(
                {
                    # v2: wall_s = amortized per-unit share of the batch
                    # wall (v1 recorded the full batch wall per unit);
                    # the version marker lets metrics readers mix logs
                    # written by either schema without ambiguity.
                    "lineage_version": 2,
                    "stage": self.stage,
                    "unit": u,
                    "status": "done",
                    "rows": counts.get(u, 0),
                    "wall_s": round(wall / len(pending), 3),
                    "batch_wall_s": round(wall, 3),
                    "batch_units": len(pending),
                    "input_fingerprint": input_fingerprint,
                    "ts": time.time(),
                }
            )
        return {
            "units_run": len(pending),
            "units_skipped": len(done),
            "rows": sum(counts.values()),
        }

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.stage_dir)

    def metrics(self) -> list[dict]:
        """The metrics table rows (stage, unit, rows, wall) — the
        engine's replacement for the reference's throttled AMQ
        progress events (spatial.js:212-236)."""
        return self.lineage()
