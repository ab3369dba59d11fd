"""Roofline accounting for a captured serve/train trace (VERDICT r2 #1).

Groups the xplane per-op device times into model-meaningful families
(convs, attention kernels, interleave copies, gate epilogues, pads...),
drops the top-level ``%while`` scan wrapper (its body ops are already
counted individually — keeping it double-counts the whole program), and
normalizes to per-batch milliseconds. The printed table is the source for
docs/ROOFLINE.md.

    python tools/roofline.py <xplane-dir> <iters-in-trace>
"""

from __future__ import annotations

import collections
import glob
import os
import re
import sys

# order matters: first match wins
_FAMILIES = [
    ("attention kernel (Pallas)", r"custom-call"),
    ("scan wrapper (excluded)", r"^%while"),
    ("interleave copy (d2s)", r"^%copy\.\d+ = bf16\[\d+,\d+,2,\d+,2"),
    ("gate epilogue + interleave", r"pad_maximum_fusion|bitcast_multiply"),
    ("attention pad/unpad", r"^%pad"),
    ("output head (tanh)", r"tanh"),
    ("stem conv (5x5 Cin=4)", r"= .*fusion\(bf16\[5,5,4,|bf16\[5,5,4,\d+\]"),
    ("conv (+fused epilogue)", r"convolution|^%fusion\.\d+ = bf16"),
    ("copies/layout", r"^%copy"),
    ("other", r""),
]


def load_per_op(outdir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no xplane.pb under {outdir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    per_op = collections.Counter()
    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line.name not in ("XLA Ops",):
                continue
            for ev in line.events:
                per_op[ev_meta[ev.metadata_id].name] += ev.duration_ps
    return per_op


def classify(name: str) -> str:
    for fam, pat in _FAMILIES:
        if re.search(pat, name):
            return fam
    return "other"


def main() -> int:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_serve_r3"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    per_op = load_per_op(outdir)
    fam = collections.Counter()
    fam_ops = collections.defaultdict(list)
    for name, ps in per_op.items():
        f = classify(name)
        fam[f] += ps
        fam_ops[f].append((ps, name))
    total = sum(ps for f, ps in fam.items() if "excluded" not in f)
    print(f"device total (w/o scan wrapper): {total/1e9:.1f} ms over "
          f"{iters} batches = {total/1e9/iters:.2f} ms/batch")
    for f, ps in fam.most_common():
        if "excluded" in f:
            print(f"  [excluded] {f}: {ps/1e9:.1f} ms (scan double-count)")
            continue
        print(f"  {ps/1e9/iters:8.2f} ms/batch  {100*ps/total:5.1f}%  {f}")
    if os.environ.get("ROOFLINE_DETAIL"):
        want = os.environ["ROOFLINE_DETAIL"]
        for ps, name in sorted(fam_ops.get(want, []), reverse=True)[:15]:
            print(f"    {ps/1e9/iters:7.3f} ms/batch  {name[:140]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
