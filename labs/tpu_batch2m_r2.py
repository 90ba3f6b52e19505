"""Round-2 TPU session #15: 2M-lane chunks (CH=128) vs 1M x CH=256.

Same total queries/pass; bigger lanes amortize per-chunk fixed costs
(minhash scan, hier compaction) if those aren't linear.

Run: timeout 1500 python tpu_batch2m_r2.py > /tmp/tpu_batch2m_r2.out 2>&1
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
        (
            "1graph batch=2M CH=128",
            {"MAZU_BENCH_BATCH": str(1 << 21), "MAZU_BENCH_CHUNKS": "128"},
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
