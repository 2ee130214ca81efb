"""transformWithStateInPandas vs applyInPandasWithState on the q294 shape.

The r9 verdict flagged q294's 2.87x sf1 slope as per-batch Python state
overhead and asked for a measured comparison against Spark 4's
transformWithState once available.  Both harnesses run the identical
workload: per-user running (count, sum) over the staged events stream,
maxFilesPerTrigger=1 over 4 files (so 4 micro-batches of real state
carry-over), availableNow, parquet sink.

transformWithState requires the RocksDB state store provider; the session
conf is set per-query via the writeStream option scope (falls back to a
session-level set/restore).

Usage: python tools/tws_spike.py [sf_dir] [runs]

MEASURED OUTCOME (r10, 2026-08-16): ENVIRONMENT-BLOCKED.  The
applyInPandasWithState arm runs (7.56 s at sf0.1, 1500 users); the
transformWithStateInPandas arm crashes in Spark's own driver worker before
the first batch — its state-server protocol imports
pyspark.sql.streaming.proto.StateMessage_pb2, which needs the `protobuf`
Python package, and `import google.protobuf` fails in this container
(ModuleNotFoundError: no module named 'google'; no pip installs allowed).
Same env-blocked class as PIL/ffmpeg for compressed media.  q294 stays on
applyInPandasWithState; re-run this spike the round protobuf appears.
"""

from __future__ import annotations

import hashlib
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def stage_src(spark, sf_dir):
    ev_path = os.path.join(sf_dir, "events.parquet")
    tag = hashlib.md5(f"{sf_dir}|events5".encode()).hexdigest()[:8]
    src_dir = os.path.join(tempfile.gettempdir(), f"stream_src_events5_{tag}")
    if not os.path.exists(os.path.join(src_dir, "_SUCCESS")):
        spark.read.parquet(ev_path).repartition(4).write.mode(
            "overwrite"
        ).parquet(src_dir)
    return src_dir, spark.read.parquet(ev_path).schema


def run_aipws(spark, src_dir, schema):
    """the shipped q294 harness (applyInPandasWithState)"""

    def _fn(key, pdfs, state):
        (user,) = key
        cnt, tot = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            tot += float(pdf["value"].fillna(0.0).sum())
        state.update((int(cnt), float(tot)))
        yield pd.DataFrame(
            {"user_id": [int(user)], "n": [int(cnt)], "total": [float(tot)]}
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .select("user_id", "value")
    )
    emitted = stream.groupBy("user_id").applyInPandasWithState(
        _fn, "user_id long, n long, total double", "cnt long, tot double",
        "append", "NoTimeout",
    )
    return emitted


def run_tws(spark, src_dir, schema):
    """Spark 4 transformWithStateInPandas, same semantics"""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "cnt long, tot double"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                cnt, tot = self._state.get()
            else:
                cnt, tot = 0, 0.0
            for pdf in rows:
                cnt += len(pdf)
                tot += float(pdf["value"].fillna(0.0).sum())
            self._state.update((int(cnt), float(tot)))
            yield pd.DataFrame(
                {"user_id": [int(key[0])], "n": [int(cnt)], "total": [float(tot)]}
            )

        def close(self) -> None:
            pass

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .select("user_id", "value")
    )
    emitted = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="user_id long, n long, total double",
        outputMode="append",
        timeMode="None",
    )
    return emitted


def drive(spark, emitted, n_parts=8):
    out_dir = tempfile.mkdtemp(prefix="tws_out_")
    ckpt = tempfile.mkdtemp(prefix="tws_ckpt_")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    try:
        q = (
            emitted.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    res = spark.read.parquet(out_dir)
    final = res.groupBy("user_id").agg(
        F.max_by(F.struct("n", "total"), "n").alias("s")
    )
    return final.select(
        "user_id", F.col("s.n").alias("n"), F.round("s.total", 6).alias("t")
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from polars_net_spark import get_spark

    spark = get_spark(app_name="tws_spike")
    src_dir, schema = stage_src(spark, sf_dir)

    results = {}
    for name, builder, extra_conf in [
        ("applyInPandasWithState", run_aipws, {}),
        (
            "transformWithStateInPandas",
            run_tws,
            {
                "spark.sql.streaming.stateStore.providerClass":
                    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
            },
        ),
    ]:
        saved = {}
        for k, v in extra_conf.items():
            try:
                saved[k] = spark.conf.get(k)
            except Exception:
                saved[k] = None
            spark.conf.set(k, v)
        try:
            best = None
            rows = None
            for _ in range(runs):
                t0 = time.time()
                out = drive(spark, builder(spark, src_dir, schema))
                rows = sorted(out.collect())
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            results[name] = (best, rows)
            print(f"{name}: {best:.2f}s, {len(rows)} users", flush=True)
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    a, ra = results["applyInPandasWithState"]
    b, rb = results["transformWithStateInPandas"]
    same = ra == rb
    print(f"results identical: {same}")
    print(f"tws/aipws wall ratio: {b / a:.2f}x")


if __name__ == "__main__":
    main()
