"""Shared jax.profiler trace capture + top-HLO-op aggregation (no
TensorBoard in this environment — the trace.json.gz is parsed directly).
Used by prefill_trace.py and train7b_probe.py (PROBE_TRACE=1)."""
import glob
import gzip
import json
import os
from collections import defaultdict


def trace_and_top_ops(fn, trace_dir="/tmp/jaxtrace", top_n=25):
    """Run ``fn()`` under a profiler trace; return the top device ops dict."""
    import jax

    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    fn()
    jax.profiler.stop_trace()

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        return {"error": "no trace produced", "dir": trace_dir}
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    by_name = defaultdict(float)
    total = 0.0
    # map pid → process name so only device (TPU) lanes are aggregated;
    # host python / launch / runtime threads would double-count wall time
    # against device op time otherwise
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev.get("pid")] = ev.get("args", {}).get("name", "")
    device_pids = {pid for pid, n in pid_names.items()
                   if "TPU" in n or "/device:" in n}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "")
        if not name or name.startswith(("$", "process_")):
            continue
        args = ev.get("args", {})
        if (ev.get("pid") in device_pids if device_pids
                else ("long_name" in args or "hlo_op" in args)):
            key = name.split(".")[0][:48]
            by_name[key] += ev["dur"]
            total += ev["dur"]
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:top_n]
    return {"total_us_allevents": round(total, 1),
            "top": [{"op": k, "ms": round(v / 1e3, 2)} for k, v in top]}
