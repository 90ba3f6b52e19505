"""Round-2 TPU session #9: mono engine (single-hash KCDict) on chr01.

Main phase = canon + 1 hash + ONE 56B row gather (no minimizer scan, no
bucket-bounds gather). Sweep load 0.0625 / 0.125 at CH=64.

Run: timeout 3000 python tpu_mono_r2.py > /tmp/tpu_mono_r2.out 2>&1
"""
import os
import time

import bench


def log(*a):
    import sys

    print(*a, file=sys.stderr, flush=True)


def main():
    for tag, env in (
        (
            "mono load=0.0625 CH=64",
            {
                "MAZU_BENCH_ENGINE": "mono",
                "MAZU_BENCH_LOAD": "0.0625",
                "MAZU_BENCH_CHUNKS": "64",
            },
        ),
        (
            "mono load=0.125 CH=64",
            {
                "MAZU_BENCH_ENGINE": "mono",
                "MAZU_BENCH_LOAD": "0.125",
                "MAZU_BENCH_CHUNKS": "64",
            },
        ),
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
