"""Probe: single-thread throughput of the native pure-Python JPEG
fallback — the numbers behind DEPLOYMENT.md's "ship PIL where
whole-corpus decode throughput matters" guidance.

Encodes one synthetic asset per variant with this repo's own encoders
(so the probe runs on a bare container) and times repeated decodes for
a fixed wall budget. The mapInPandas plumbing parallelizes this across
all executor cores; the per-core figure is what this prints.

Usage: python tools/jpeg_decode_probe.py [side (default 64)] [secs (3)]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from inbev_data_engineering_case_spark.operators import (  # noqa: E402
    multimodal as M,
)


def main() -> None:
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (side, side, 3), dtype=np.uint8)
    variants = [
        ("baseline 444", M._jpeg_encode_baseline(img, 80)),
        ("baseline 420", M._jpeg_encode_baseline(img, 80, subsample=True)),
        ("progressive 444", M._jpeg_encode_progressive(img, 80)),
        (
            "progressive 420",
            M._jpeg_encode_progressive(img, 80, subsample=True),
        ),
    ]
    for name, payload in variants:
        M._jpeg_decode(payload)  # warm-up
        t0 = time.perf_counter()
        n = 0
        while time.perf_counter() - t0 < budget:
            M._jpeg_decode(payload)
            n += 1
        dt = time.perf_counter() - t0
        print(
            f"{name:16s}: {n / dt:7.1f} img/s  "
            f"({side}x{side} q80, {len(payload)} bytes)"
        )


if __name__ == "__main__":
    main()
