"""Round-2 TPU session #12: 50Mbp synthetic scale re-measure (one-graph).

Round-1 fact: 18.3M q/s at 50Mbp (4GB direct index, CH=8 pipelined).
This session re-measures with the one-graph driver + uniform whole-index
query sampling (MAZU_BENCH_REFS=5000):
  (a) sshash-direct CH=64  (1.1GB-class table)
  (b) mono2-occ32  CH=32 load=0.25 (7.5GB-class table, 1-gather probe)

Run: timeout 3000 python tpu_synth50_r2.py > /tmp/tpu_synth50_r2.out 2>&1
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)
import os
import time

import bench


def log(*a):
    import sys

    print(*a, file=sys.stderr, flush=True)


def main():
    base = {
        "MAZU_BENCH_SYNTH": "50000000",
        "MAZU_BENCH_REFS": "5000",
    }
    for tag, env in (
        (
            "synth50M direct CH=64",
            {"MAZU_BENCH_ENGINE": "direct", "MAZU_BENCH_CHUNKS": "64"},
        ),
        (
            "synth50M mono2 L=0.25 CH=32",
            {
                "MAZU_BENCH_ENGINE": "mono2",
                "MAZU_BENCH_LOAD": "0.25",
                "MAZU_BENCH_CHUNKS": "32",
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
