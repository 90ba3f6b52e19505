"""Round-2 TPU session #10: mono2 sweep on chr01.

mono load=0.125 measured 67.3M; mono2 halves the overflow class (second
occ inline) at 36B slot rows. Sweep mono2 load 0.125/0.25/0.5 and mono
load 0.25 (locality probe), CH=64.

Run: timeout 3000 python tpu_mono2_r2.py > /tmp/tpu_mono2_r2.out 2>&1
"""
import os
import time

import bench


def log(*a):
    import sys

    print(*a, file=sys.stderr, flush=True)


def main():
    base = {"MAZU_BENCH_CHUNKS": "64"}
    for tag, env in (
        ("mono2 load=0.125", {"MAZU_BENCH_ENGINE": "mono2", "MAZU_BENCH_LOAD": "0.125"}),
        ("mono2 load=0.25", {"MAZU_BENCH_ENGINE": "mono2", "MAZU_BENCH_LOAD": "0.25"}),
        ("mono2 load=0.5", {"MAZU_BENCH_ENGINE": "mono2", "MAZU_BENCH_LOAD": "0.5"}),
        ("mono load=0.25", {"MAZU_BENCH_ENGINE": "mono", "MAZU_BENCH_LOAD": "0.25"}),
    ):
        saved = dict(os.environ)
        os.environ.update(base | env)
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
