"""Round-2 TPU session #13: 50Mbp mono2 retry at HBM-fitting load.

mono2 L=0.25 at 50Mbp OOM'd (7.67GB table + one-graph buffers).
L=0.5 halves the table (3.8GB); overflow grows ~2x but phase-2 is
capacity-proportional and small either way at this scale.

Run: timeout 3000 python tpu_synth50b_r2.py > /tmp/tpu_synth50b_r2.out 2>&1
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)
import os
import time

import bench


def log(*a):
    import sys

    print(*a, file=sys.stderr, flush=True)


def main():
    base = {"MAZU_BENCH_SYNTH": "50000000", "MAZU_BENCH_REFS": "5000"}
    for tag, env in (
        (
            "synth50M mono2 L=0.5 CH=16",
            {
                "MAZU_BENCH_ENGINE": "mono2",
                "MAZU_BENCH_LOAD": "0.5",
                "MAZU_BENCH_CHUNKS": "16",
            },
        ),
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
