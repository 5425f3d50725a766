"""Shared TPU profiling utilities for the scripts/tpu_*_session.py tools.

Lesson learned in round 2: the xplane device plane has BOTH an "XLA Ops"
line (serialized, sums to the step time) and an "Async XLA Ops" line whose
copy-start spans overlap compute — summing both (as the round-1 profiler
did) massively over-attributes "copy" time.  Only the serialized line is
attributed here, and fusions are classified by the content of their called
computation in the optimized HLO, not by their op name.
"""

import glob
import os
import re
from typing import Dict, Tuple


def hlo_fusion_classifier(hlo_text: str):
    """Returns classify(op_name) → 'conv' | 'pooling' | 'copy/layout' |
    'elementwise/optimizer' | 'reduce' based on the fusion's computation."""
    comps = {}
    for m in re.finditer(
        r"%?([\w.\-]+) = [^\n]*? fusion\([^\n]*?calls=%?([\w.\-]+)", hlo_text
    ):
        comps[m.group(1)] = m.group(2)
    bodies: Dict[str, list] = {}
    cur = None
    for line in hlo_text.splitlines():
        m = re.match(r"%?([\w.\-]+) \(.*\) -> .* \{", line)
        if m:
            cur = m.group(1)
            bodies[cur] = []
        elif cur is not None:
            bodies[cur].append(line)
            if line.startswith("}"):
                cur = None

    def classify(op_name: str) -> str:
        base = op_name.lstrip("%").split(" = ")[0]
        if base.startswith(("copy", "transpose", "bitcast", "reverse")):
            return "copy/layout"
        if base.startswith(("select_and_scatter", "select-and-scatter",
                            "reduce-window", "reduce_window")):
            return "pooling"
        if "convolution" in base and base not in comps:
            return "conv"
        comp = comps.get(base)
        if comp is None:
            return "misc"
        body = "\n".join(bodies.get(comp, []))
        if " convolution(" in body:
            return "conv"
        if "select-and-scatter(" in body or "reduce-window(" in body:
            return "pooling"
        if " dot(" in body:
            return "dot"
        if " reduce(" in body and "[]" in body:
            return "reduce"
        return "elementwise/optimizer"

    return classify


def serialized_op_times(logdir: str) -> Tuple[Dict[str, float], float]:
    """{op name: total ms} from the serialized 'XLA Ops' line only, plus the
    total ms across the trace window."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    assert files, f"no xplane trace under {logdir}"
    xspace = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    op_time: Dict[str, float] = {}
    for plane in xspace.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for e in line.events:
                meta = plane.event_metadata.get(e.metadata_id)
                name = (meta.name if meta else "?").split(" = ")[0]
                op_time[name] = op_time.get(name, 0.0) + e.duration_ps / 1e9
    return op_time, sum(op_time.values())


def categorize(op_time: Dict[str, float], classify) -> Dict[str, float]:
    cats: Dict[str, float] = {}
    for n, t in op_time.items():
        c = classify(n)
        cats[c] = cats.get(c, 0.0) + t
    return cats
