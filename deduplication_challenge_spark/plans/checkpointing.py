"""Checkpoint-mode switch — the cluster-scale fault-tolerance knob.

``localCheckpoint`` pins the materialized data to EXECUTOR-LOCAL storage:
fastest on a healthy cluster (no distributed write), but an executor loss
mid-job kills the query instead of recomputing lineage — acceptable on
local[*], a real fragility for the long CC fixpoint loop and the huge anchor
intermediate on a 1000-executor cluster.  ``checkpoint_mode='reliable'``
switches those sites to ``SparkContext.setCheckpointDir`` + ``checkpoint()``
(HDFS/object-store backed): the materialization survives executor loss and
lineage is truncated identically, at the cost of a distributed write per
checkpoint.  Output is identical in both modes (checkpointing never changes
semantics, only recovery) — tests pin that.

Set the checkpoint dir explicitly on a cluster
(``spark.sparkContext.setCheckpointDir('hdfs://...')``); when unset, the
first reliable checkpoint falls back to a driver-local temp dir (correct on
local[*]; on a real cluster executors cannot read the driver's disk, so the
explicit call is part of cluster deployment, same as choosing a warehouse
path).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame

MODES = ("local", "reliable")


def _mode_of(cfg) -> str:
    mode = cfg if isinstance(cfg, str) else getattr(cfg, "checkpoint_mode", "local")
    if mode not in MODES:
        raise ValueError(f"checkpoint_mode must be one of {MODES}, got {mode!r}")
    return mode


def ensure_checkpoint_dir(spark) -> str:
    """Reliable checkpoints need a checkpoint dir; default one if unset."""
    sc = spark.sparkContext
    cur = sc.getCheckpointDir()
    if not cur:
        cur = tempfile.mkdtemp(prefix="spark_reliable_ckpt_")
        sc.setCheckpointDir(cur)
    return cur


def stage_checkpoint(df: DataFrame, cfg="local", eager: bool = False) -> DataFrame:
    """Checkpoint ``df`` per the configured mode (cfg object or mode str)."""
    if _mode_of(cfg) == "reliable":
        ensure_checkpoint_dir(df.sparkSession)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def fs_delete(spark, path: str) -> None:
    """Delete a path through the Hadoop FileSystem API — works for local
    dirs AND HDFS/object-store checkpoint dirs on a real cluster (a plain
    shutil.rmtree would only ever clean the driver's disk)."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    fs.delete(hpath, True)
