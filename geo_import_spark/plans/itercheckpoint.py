"""Durable lineage truncation for iterative operators (VERDICT r3 #2).

Every iterative operator here (duplicate_clusters, knn_join, pagerank,
label_dense_regions) must truncate lineage each round or the
driver-bounded loop builds an unbounded plan. The default truncation is
`localCheckpoint`: blocks live on executors — fast, zero extra I/O, but
on a real cluster losing ONE executor mid-loop kills the whole job
unrecoverably (no lineage left to rebuild the lost blocks). Fine at
local[32]; at 100x on preemptible nodes it is the first thing that
breaks.

`LoopCheckpointer` makes durability an opt-in policy: pass a
`checkpoint_dir` (any Hadoop-visible path — HDFS / S3A / local) and the
loop state is written as parquet every `every` rounds and read back, so
a lost executor only replays from the last durable round, and a killed
DRIVER can resume: `latest()` finds the newest round with a _SUCCESS
marker and the operator restarts the loop from there instead of from
scratch (tests/test_itercheckpoint.py kills a run mid-loop and proves
the resumed run starts at round N+1 with an identical final answer).

The directory listing goes through the JVM Hadoop FileSystem API — the
same path string works on HDFS/S3 on a real cluster, not just the
local FS.

Tradeoff (why localCheckpoint stays the default): a durable round costs
a full write+read of the state through the object store. For shallow
loops on small state (min-label propagation converges in 3-5 rounds on
real dup clusters) that is usually noise; for tight loops on big state,
set `every` > 1 to amortize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


class LoopCheckpointer:
    """Per-loop lineage-truncation policy.

    checkpoint_dir=None (default): `truncate` == localCheckpoint.
    checkpoint_dir=<path>: rounds where `round_idx % every == 0` are
    written to <dir>/<name>/round_<idx> as parquet and read back;
    other rounds still localCheckpoint (durability cadence, not
    per-round cost). `latest` returns the newest durable round for
    resume.
    """

    def __init__(self, checkpoint_dir: str | None = None,
                 name: str = "state", every: int = 1):
        self.checkpoint_dir = checkpoint_dir
        self.name = name
        self.every = max(1, every)

    @property
    def durable(self) -> bool:
        return self.checkpoint_dir is not None

    def _round_path(self, round_idx: int) -> str:
        return f"{self.checkpoint_dir}/{self.name}/round_{round_idx:05d}"

    def truncate(self, df: DataFrame, round_idx: int, eager: bool = True) -> DataFrame:
        if not self.durable or round_idx % self.every:
            return df.localCheckpoint(eager=eager)
        path = self._round_path(round_idx)
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)

    def load(self, spark: SparkSession, round_idx: int) -> DataFrame | None:
        """The state written at exactly `round_idx`, or None if that
        round has no completed write. Lets an operator with SEVERAL
        state frames resume them all from one coherent round (the one
        whose LAST-written frame completed)."""
        if not self.durable:
            return None
        path = self._round_path(round_idx)
        fs, _ = _fs_and_path(spark, path)
        marker = spark._jvm.org.apache.hadoop.fs.Path(f"{path}/_SUCCESS")
        if not fs.exists(marker):
            return None
        return spark.read.parquet(path)

    def latest(self, spark: SparkSession):
        """(round_idx, DataFrame) of the newest COMPLETED durable round
        (judged by the parquet _SUCCESS marker), or (None, None)."""
        if not self.durable:
            return None, None
        base = f"{self.checkpoint_dir}/{self.name}"
        fs, bpath = _fs_and_path(spark, base)
        if not fs.exists(bpath):
            return None, None
        best = None
        for status in fs.listStatus(bpath):
            dname = status.getPath().getName()
            if not dname.startswith("round_"):
                continue
            marker = spark._jvm.org.apache.hadoop.fs.Path(
                f"{base}/{dname}/_SUCCESS"
            )
            if not fs.exists(marker):
                continue  # interrupted mid-write: not a completed round
            idx = int(dname.rsplit("_", 1)[1])
            if best is None or idx > best:
                best = idx
        if best is None:
            return None, None
        return best, spark.read.parquet(self._round_path(best))
