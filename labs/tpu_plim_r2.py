"""Round-2 TPU session #7: probe-limit sweep at CH=64.

Attribution shows phase2+compaction = 5.9ms of the 19.6ms chunk; the
reprobe overflow class (20523/1M lanes at plim=2) is plim-reducible and
extra probes fetch ADJACENT rows (cache-cheap). Sweep plim 3, 4 and
CH=128, then reads mode at the winner.

Run: timeout 3000 python tpu_plim_r2.py > /tmp/tpu_plim_r2.out 2>&1
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
        ("CH=64 plim=3", {"MAZU_BENCH_CHUNKS": "64", "MAZU_BENCH_PLIM": "3"}),
        ("CH=64 plim=4", {"MAZU_BENCH_CHUNKS": "64", "MAZU_BENCH_PLIM": "4"}),
        ("CH=128 plim=2", {"MAZU_BENCH_CHUNKS": "128"}),
        (
            "reads CH-auto plim=3",
            {"MAZU_BENCH_MODE": "reads1graph", "MAZU_BENCH_PLIM": "3"},
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
