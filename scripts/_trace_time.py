"""Trace-based device timing: per-call `block_until_ready` under-reports
through the attached-TPU tunnel (queued work escapes accounting), so the
only trustworthy clock is the device trace. `device_time(fn, *args)` runs
fn n times inside jax.profiler.trace and returns the summed device-event
time / n (seconds)."""
import glob
import gzip
import json
import os
import re
import shutil
import tempfile

import jax


def _device_ms(trace_dir: str) -> float:
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    assert files, f"no trace written under {trace_dir}"
    with gzip.open(sorted(files)[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    # use the top-level module spans (jit_*): summing leaf events double
    # counts when control flow is present (a `while` op's span contains
    # its body's events)
    parents = 0.0
    leaves = 0.0
    for e in ev:
        if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], ""):
            n = e.get("name", "")
            if n.startswith("jit_") or n.startswith("jit("):
                parents += e.get("dur", 0)
            else:
                leaves += e.get("dur", 0)
    return (parents if parents > 0 else leaves) / 1e3


def device_time(fn, *args, n=3):
    """Mean device-side seconds per call of fn(*args)."""
    jax.block_until_ready(fn(*args))  # compile outside the trace
    d = tempfile.mkdtemp(prefix="jtt_")
    try:
        with jax.profiler.trace(d):
            for _ in range(n):
                jax.block_until_ready(fn(*args))
        return _device_ms(d) / 1e3 / n
    finally:
        shutil.rmtree(d, ignore_errors=True)
