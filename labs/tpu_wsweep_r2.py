"""Round-2 TPU session #8: minimizer-width sweep at CH=128 plim=2.

Larger w -> fewer multi-occurrence minimizers -> smaller buckets -> fewer
reprobe-overflow lanes (the 2% class driving phase-2 cost). Sweep w=17,
19, 21 vs the w=15 baseline (54.1M). Also 50Mbp synthetic at the winner.

Run: timeout 3000 python tpu_wsweep_r2.py > /tmp/tpu_wsweep_r2.out 2>&1
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)
import os
import time

import bench


def log(*a):
    import sys

    print(*a, file=sys.stderr, flush=True)


def main():
    for tag, env in (
        ("w=17", {"MAZU_BENCH_W": "17"}),
        ("w=19", {"MAZU_BENCH_W": "19"}),
        ("w=21", {"MAZU_BENCH_W": "21"}),
    ):
        saved = dict(os.environ)
        os.environ.update(env)
        t0 = time.time()
        log(f"=== {tag} ===")
        try:
            bench.main()
        except Exception as e:
            log(f"[{tag}] FAILED: {type(e).__name__}: {e}")
        log(f"[{tag}] total {time.time()-t0:.0f}s")
        os.environ.clear()
        os.environ.update(saved)


if __name__ == "__main__":
    main()
