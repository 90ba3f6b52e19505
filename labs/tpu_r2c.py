"""Round-2 TPU session: compilation-cache efficacy + reads1graph with the
mono2 default + CH=256.

Run:    timeout 3000 python tpu_r2c.py > /tmp/tpu_r2c.out 2>&1
Rerun:  MAZU_ONLY=cache timeout 1200 python tpu_r2c.py > /tmp/tpu_r2c2.out 2>&1
(the rerun measures the WARM-cache compile time in a fresh process)
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)
import os
import time

import bench


def log(*a):
    import sys

    print(*a, file=sys.stderr, flush=True)


def main():
    only = os.environ.get("MAZU_ONLY", "")
    runs = [
        ("cache", "default mono2 CH=128 + compile cache",
         {"MAZU_BENCH_CACHE": "/root/repo/.xla_cache"}),
        ("reads", "reads1graph mono2",
         {"MAZU_BENCH_MODE": "reads1graph",
          "MAZU_BENCH_CACHE": "/root/repo/.xla_cache"}),
        ("ch256", "1graph mono2 CH=256",
         {"MAZU_BENCH_CHUNKS": "256",
          "MAZU_BENCH_CACHE": "/root/repo/.xla_cache"}),
        ("readsss", "reads1graph sshash-direct (locality control)",
         {"MAZU_BENCH_MODE": "reads1graph",
          "MAZU_BENCH_ENGINE": "direct",
          "MAZU_BENCH_CACHE": "/root/repo/.xla_cache"}),
    ]
    for tag, desc, env in runs:
        if only and tag != only:
            continue
        saved = dict(os.environ)
        os.environ.update(env)
        t0 = time.time()
        log(f"=== {tag}: {desc} ===")
        try:
            bench.main()
        except Exception as e:
            log(f"[{tag}] FAILED: {type(e).__name__}: {e}")
        log(f"[{tag}] total {time.time()-t0:.0f}s")
        os.environ.clear()
        os.environ.update(saved)


if __name__ == "__main__":
    main()
