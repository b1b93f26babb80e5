"""Rest until the throttle probe reads calibrated-cold (bench.py's probe),
then exit.  Usage: python tools/rest_probe.py [target] [max_wait_s]"""
from __future__ import annotations

import os
import sys
import time

for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
          "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(v, "1")
import numpy as np


def probe() -> float:
    a = np.random.RandomState(0).randn(600, 600)
    b = a.copy()
    t0 = time.time()
    for _ in range(60):
        b = b @ a
        b *= 1e-3
    return time.time() - t0


def main() -> None:
    target = float(sys.argv[1]) if len(sys.argv) > 1 else 1.95
    max_wait = float(sys.argv[2]) if len(sys.argv) > 2 else 420
    t_start = time.time()
    p = probe()
    print(f"probe {p:.3f}", flush=True)
    while p > target and time.time() - t_start < max_wait:
        time.sleep(45)
        p = probe()
        print(f"probe {p:.3f}", flush=True)
    print(f"rested={p <= target} final={p:.3f} waited={time.time()-t_start:.0f}s")


if __name__ == "__main__":
    main()
