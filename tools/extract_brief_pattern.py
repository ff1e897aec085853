"""Extract the 256 BRIEF point-pair pattern from the reference header.

The pattern is *data*, not code: it is the learned OpenCV ORB bit pattern
(see reference Brief.h:62-63 "generated bit pattern from opencv ORB.cpp").
We lift the (dx0, dy0, dx1, dy1) integer tuples in bit order and emit a
Python data module consumed by pislam_tpu.ops.brief.
"""
import re
import sys

SRC = "/root/reference/include/Brief.h"
DST = "/root/repo/pislam_tpu/ops/_brief_pattern.py"

pat = re.compile(
    r"briefBit<vstep,\s*rot,\s*(-?\d+)\s*,\s*(-?\d+)\s*,\s*(-?\d+)\s*,\s*(-?\d+)\s*>"
)

pairs = []
with open(SRC) as f:
    for line in f:
        m = pat.search(line)
        if m and "template" not in line:
            pairs.append(tuple(int(g) for g in m.groups()))

assert len(pairs) == 256, f"expected 256 pairs, got {len(pairs)}"

with open(DST, "w") as f:
    f.write('"""ORB/BRIEF-256 point-pair pattern (learned OpenCV ORB pattern).\n\n')
    f.write("Data provenance: the canonical OpenCV ORB.cpp bit pattern, as used by\n")
    f.write("the reference (reference Brief.h:62-133 and onward, one briefBit per\n")
    f.write("descriptor bit). Entry i is (dx0, dy0, dx1, dy1): descriptor bit i is\n")
    f.write("set iff img[y+dy0, x+dx0] < img[y+dy1, x+dx1] after rotating both\n")
    f.write("points by the keypoint's discretised orientation (reference\n")
    f.write('Brief.h:28-53). Bit order: word w bit b -> index 32*w + b.\n"""\n\n')
    f.write("BRIEF_PATTERN = (\n")
    for p in pairs:
        f.write(f"    {p!r},\n")
    f.write(")\n")

print(f"wrote {len(pairs)} pairs to {DST}")
