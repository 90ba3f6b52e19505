"""Round-2 TPU session #12: mono2-occ32 (56B bucket rows via piscem repack,
single-gather probe, both occs + cnt inline) on chr01.

mono@0.25 = 72.6M is the bar. occ32 gives the same row size with less
than half the overflow (41K vs 87K per 1M).

Run: timeout 3000 python tpu_mono4_r2.py > /tmp/tpu_mono4_r2.out 2>&1
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)
import os
import time

import bench


def log(*a):
    import sys

    print(*a, file=sys.stderr, flush=True)


def main():
    runs = [
        ("mono2o32 L=0.25 CH=64", {"MAZU_BENCH_ENGINE": "mono2", "MAZU_BENCH_LOAD": "0.25", "MAZU_BENCH_CHUNKS": "64"}),
        ("mono2o32 L=0.5 CH=64", {"MAZU_BENCH_ENGINE": "mono2", "MAZU_BENCH_LOAD": "0.5", "MAZU_BENCH_CHUNKS": "64"}),
        ("mono2o32 L=0.25 CH=128", {"MAZU_BENCH_ENGINE": "mono2", "MAZU_BENCH_LOAD": "0.25", "MAZU_BENCH_CHUNKS": "128"}),
        ("mono-repack L=0.25 CH=64", {"MAZU_BENCH_ENGINE": "mono", "MAZU_BENCH_LOAD": "0.25", "MAZU_BENCH_CHUNKS": "64"}),
    ]
    for tag, env in runs:
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
