"""Round-2 TPU session #6: CH / type-split sweep of the 1graph bench.

CH=32 plain measured 50.86M (stageattr session). Sweep: type-split M2B=auto
at CH=32, CH=48, CH=64 plain — one process, sequential bench.main() calls.

Run: timeout 3000 python tpu_chsweep_r2.py > /tmp/tpu_chsweep_r2.out 2>&1
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)
import os
import sys
import time

import bench


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    for tag, env in (
        ("CH=32 M2B=auto", {"MAZU_BENCH_CHUNKS": "32", "MAZU_BENCH_M2B": "auto"}),
        ("CH=48", {"MAZU_BENCH_CHUNKS": "48"}),
        ("CH=64", {"MAZU_BENCH_CHUNKS": "64"}),
        ("CH=64 M2B=auto", {"MAZU_BENCH_CHUNKS": "64", "MAZU_BENCH_M2B": "auto"}),
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
