"""Round-2 TPU session #11: mono2-occ32 (56B bucket rows, single-gather
probe, both occs inline) on chr01. Sweep loads 0.125/0.25/0.5 at CH=64;
winner also at CH=128. mono@0.25 measured 72.6M — the target to beat.

Run: timeout 3000 python tpu_mono3_r2.py > /tmp/tpu_mono3_r2.out 2>&1
"""
import os
import time

import bench


def log(*a):
    import sys

    print(*a, file=sys.stderr, flush=True)


def main():
    runs = [
        ("mono2 L=0.25 CH=64", {"MAZU_BENCH_ENGINE": "mono2", "MAZU_BENCH_LOAD": "0.25", "MAZU_BENCH_CHUNKS": "64"}),
        ("mono2 L=0.5 CH=64", {"MAZU_BENCH_ENGINE": "mono2", "MAZU_BENCH_LOAD": "0.5", "MAZU_BENCH_CHUNKS": "64"}),
        ("mono2 L=0.125 CH=64", {"MAZU_BENCH_ENGINE": "mono2", "MAZU_BENCH_LOAD": "0.125", "MAZU_BENCH_CHUNKS": "64"}),
        ("mono2 L=0.25 CH=128", {"MAZU_BENCH_ENGINE": "mono2", "MAZU_BENCH_LOAD": "0.25", "MAZU_BENCH_CHUNKS": "128"}),
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
