"""One-shot generator for the checked-in golden PNG.

gradient_8x6.png: 8×6 RGB, pixel (x, y) = (x·30, y·40, (x+y)·10),
encoded with a mix of scanline filters so the on-disk file exercises
real defiltering. Written with the stdlib only; the expected channel
means in tests/test_r6_operators.py derive from the same formula.

Run from the repo root:  python tests/golden/make_png.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tests.test_r6_operators import _png_encode  # noqa: E402

W, H = 8, 6
rgb = bytes(
    v
    for y in range(H)
    for x in range(W)
    for v in (x * 30, y * 40, (x + y) * 10)
)
png = _png_encode(W, H, rgb, color=2, filters=[0, 1, 2, 3, 4, 1])
out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "gradient_8x6.png")
with open(out, "wb") as f:
    f.write(png)
print(f"wrote {out} ({len(png)} bytes)")
