"""Read back jax.profiler traces: the device 'XLA Ops' timeline.

Shared by bench.py (whole-step HBM bytes for the roofline JSON) and
scripts/profile_step.py (per-op time/bytes breakdown) so the profiler-JSON
schema walking — TPU pid discovery, 'XLA Ops' tid, complete-event filter —
lives in exactly one place.

XLA's op profile annotates every device op (including Pallas custom-calls)
with cost-analysis `bytes_accessed`; summing it over the XLA Ops thread gives
whole-step HBM traffic.
"""

from __future__ import annotations

import glob
import gzip
import json
import os


def load_xla_op_events(trace_dir: str) -> list[dict]:
    """Newest trace under `trace_dir` -> list of 'XLA Ops' complete events.

    Each returned event is a Chrome-trace X event dict: `name`, `dur` (us),
    and `args` (with `bytes_accessed` when cost analysis ran). Empty list if
    no trace or no TPU device timeline was captured.
    """
    traces = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not traces:
        return []
    with gzip.open(traces[-1]) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    # One process per TPU device in the trace — collect them ALL so
    # multi-chip bytes sum across chips (bench.py divides by peak * n_chips).
    tpu_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    xla_tids = {(e["pid"], e["tid"]) for e in ev
                if e.get("ph") == "M" and e.get("pid") in tpu_pids
                and e.get("name") == "thread_name"
                and e.get("args", {}).get("name") == "XLA Ops"}
    if not xla_tids:
        return []
    return [e for e in ev if e.get("ph") == "X"
            and (e.get("pid"), e.get("tid")) in xla_tids]


def trace_total_bytes(trace_dir: str) -> int:
    """Sum per-op HBM `bytes_accessed` over the XLA Ops timeline."""
    return sum(int(e.get("args", {}).get("bytes_accessed", 0))
               for e in load_xla_op_events(trace_dir))
