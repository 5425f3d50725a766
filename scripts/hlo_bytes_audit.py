"""Attribute HLO instruction-output bytes by dtype and by source module.

Usage: python scripts/hlo_bytes_audit.py /tmp/tpu_3d_hlo.txt [top_n]

Parses a compiled HLO text dump and tallies the bytes each instruction
WRITES (output shapes), grouped by (a) element dtype, (b) the model-side
op_name metadata (module path), and (c) opcode — a fast way to find
avoidable fp32 full-tensor traffic in a bandwidth-bound step without
re-running the profiler. Copies/bitcasts are tallied separately since a
copy's read+write both bill HBM.
"""

import re
import sys
from collections import defaultdict

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "pred": 1, "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}

SHAPE_RE = re.compile(r"\b(f32|bf16|f16|s32|u32|pred|s8|u8|f64|s64|u64)\[([0-9,]*)\]")
OPNAME_RE = re.compile(r'op_name="([^"]*)"')


def shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES[dtype]


def main(path: str, top_n: int = 25):
    by_dtype = defaultdict(int)
    by_module = defaultdict(int)
    by_opcode = defaultdict(int)
    big = []

    for line in open(path):
        line = line.strip()
        m = re.match(r"%?([\w.\-]+)\s*=\s*(.*)", line)
        if not m or "=" not in line:
            continue
        rhs = m.group(2)
        # output shape(s): everything before the opcode's open-paren
        head = rhs.split(" ", 1)[0] if rhs.startswith("(") is False else rhs[: rhs.index(")") + 1]
        shapes = SHAPE_RE.findall(head)
        if not shapes:
            continue
        out_bytes = sum(shape_bytes(d, s) for d, s in shapes)
        opcode_m = re.search(r"\}?\s*([a-z\-]+)\(", rhs)
        opcode = opcode_m.group(1) if opcode_m else "?"
        if opcode in ("bitcast", "parameter", "constant", "get-tuple-element",
                      "tuple"):
            continue
        name_m = OPNAME_RE.search(line)
        op_name = name_m.group(1) if name_m else "<no-metadata>"
        # collapse to the model-module part: strip jit(step)/ prefix, keep 3
        mod = re.sub(r"^jit\([^)]*\)/", "", op_name)
        mod = "/".join(mod.split("/")[:4])
        for d, s in shapes:
            by_dtype[d] += shape_bytes(d, s)
        by_module[mod] += out_bytes
        by_opcode[opcode] += out_bytes
        if opcode == "copy":
            by_opcode["copy(read+write)"] += out_bytes  # reads bill too
        big.append((out_bytes, m.group(1), opcode, op_name[:100]))

    gb = 1e9
    print("== output bytes by dtype ==")
    for d, b in sorted(by_dtype.items(), key=lambda kv: -kv[1]):
        print(f"  {d:>5}: {b / gb:8.2f} GB")
    print("== output bytes by opcode (top) ==")
    for o, b in sorted(by_opcode.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {o:>22}: {b / gb:8.2f} GB")
    print(f"== output bytes by module (top {top_n}) ==")
    for mo, b in sorted(by_module.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"  {b / gb:8.2f} GB  {mo}")
    print(f"== biggest single instructions (top {top_n}) ==")
    for b, name, opcode, opn in sorted(big, reverse=True)[:top_n]:
        print(f"  {b / gb:6.2f} GB  {opcode:12} {name:24} {opn}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 25)
