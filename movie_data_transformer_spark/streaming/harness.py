"""Shared run-a-real-stream-and-return-a-DataFrame harness for registry
entries: availableNow trigger, update/append emissions appended to
parquet via foreachBatch (a distributed write — no memory-sink driver
collect), optional finalize step over the emissions log, result staged
to a stable dir that outlives the work-dir cleanup.

Stable dirs are per-invocation (mkdtemp) so concurrent harness/pytest
runs never collide; stale ones from previous runs are swept on the next
invocation once they are old enough that no live session can still be
lazily reading them.
"""

from __future__ import annotations

import atexit
import glob as globmod
import os
import shutil
import tempfile
import time
from collections.abc import Callable

from pyspark.sql import DataFrame

#: a stable dir older than this is fair game for the sweeper — far past
#: any realistic gap between `return spark.read.parquet(stable)` and the
#: caller's collect
_STALE_S = 6 * 3600

#: every stable dir THIS process created — removed at process exit, so a
#: one-off prefix can't leak its dir for 6h waiting on a same-prefix
#: successor run (and in-process lazy readers are necessarily done by
#: then). The prefix sweep stays as the cross-process backstop.
_OWNED_STABLE_DIRS: list[str] = []


@atexit.register
def _cleanup_owned() -> None:
    for d in _OWNED_STABLE_DIRS:
        shutil.rmtree(d, ignore_errors=True)


def register_cleanup_dir(path: str) -> str:
    """Public hook: register any per-invocation output dir for removal
    at process exit (used by write-surface registry entries so repeated
    sweeps don't accumulate /tmp litter). Returns the path."""
    _OWNED_STABLE_DIRS.append(path)
    return path


def _sweep_stale(prefix: str) -> None:
    cutoff = time.time() - _STALE_S
    for d in globmod.glob(os.path.join(tempfile.gettempdir(), prefix + "*")):
        try:
            if os.path.getmtime(d) < cutoff:
                shutil.rmtree(d, ignore_errors=True)
        except OSError:
            pass  # concurrently removed


def run_availablenow_to_df(
    stream_df: DataFrame,
    output_mode: str,
    prefix: str,
    finalize: Callable[[DataFrame], DataFrame] | None = None,
    result_from_ckpt: Callable[[str], DataFrame] | None = None,
) -> DataFrame:
    """Run `stream_df` to completion under an availableNow trigger,
    return (finalize of) the accumulated emissions as a batch DataFrame
    backed by a stable parquet staging dir.

    `result_from_ckpt`, if given, derives the result from the query's
    CHECKPOINT directory instead of the emissions log (e.g. the
    statestore reader) — it runs before the work dir is removed.

    Work dirs get a `run_` infix so the stale sweep can never prefix-
    match a caller's persistent fixture cache (e.g. mdt_late_v2_*,
    which shares the mdt_late_ stem with its entry's run dirs)."""
    spark = stream_df.sparkSession
    run_prefix = prefix + "run_"
    _sweep_stale(run_prefix)
    work = tempfile.mkdtemp(prefix=run_prefix)
    out = os.path.join(work, "emissions")

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out)

    q = (
        stream_df.writeStream.outputMode(output_mode)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .foreachBatch(_sink)
        .start()
    )
    q.awaitTermination()
    if result_from_ckpt is not None:
        result = result_from_ckpt(os.path.join(work, "ckpt"))
    else:
        if os.path.exists(out):
            emissions = spark.read.parquet(out)
        else:
            # zero micro-batches (empty/filtered-out source): foreachBatch
            # never ran, so stand in an empty emissions log with the
            # stream's schema instead of failing the parquet read
            emissions = spark.createDataFrame([], stream_df.schema)
        result = finalize(emissions) if finalize is not None else emissions
    stable = tempfile.mkdtemp(prefix=run_prefix + "final_")
    _OWNED_STABLE_DIRS.append(stable)
    result.write.mode("overwrite").parquet(stable)
    shutil.rmtree(work, ignore_errors=True)
    return spark.read.parquet(stable)
