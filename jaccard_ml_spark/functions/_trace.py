"""Opt-in per-batch UDF tracing (off unless SPARK_GRAFT_UDF_TRACE set).

Python-worker wall time is invisible to Spark's task metrics: the JVM
task thread reports "executor run time" that lumps kernel compute,
Arrow IPC, and idle-waiting on either side of the socket. When a
pandas-UDF stage misbehaves at scale the first question is "are the
workers busy or starved?" — this shim answers it with one line per
batch per worker process, appended to
``$SPARK_GRAFT_UDF_TRACE/udftrace-<pid>.jsonl``:

    {"k": <kernel>, "t0": <start>, "dt": <seconds>, "n": <rows>}

Gaps between consecutive ``t0 + dt`` and the next ``t0`` in one file
are worker idle time (waiting for the JVM to feed the next batch);
``dt`` sums are kernel busy time. Zero overhead when the env var is
unset (the wrapper short-circuits to the kernel).
"""

from __future__ import annotations

import json
import os
import time


def traced(kernel_name: str, fn):
    """Wrap ``fn(batch, ...)`` with per-call timing when tracing is on.

    The env check happens at CALL time, not construction time: UDFs are
    constructed on the driver and pickled to workers, and the trace flag
    is usually set only via ``spark.executorEnv.*`` (worker-side env).
    """

    def _wrapped(*args, **kwargs):
        trace_dir = os.environ.get("SPARK_GRAFT_UDF_TRACE")
        if not trace_dir:
            return fn(*args, **kwargs)
        t0 = time.monotonic()
        out = fn(*args, **kwargs)
        dt = time.monotonic() - t0
        try:
            n = len(args[0])
        except Exception:
            n = -1
        try:
            with open(os.path.join(
                    trace_dir, f"udftrace-{os.getpid()}.jsonl"), "a") as f:
                f.write(json.dumps({"k": kernel_name, "t0": round(t0, 4),
                                    "dt": round(dt, 4), "n": n}) + "\n")
        except OSError:
            pass
        return out

    return _wrapped
