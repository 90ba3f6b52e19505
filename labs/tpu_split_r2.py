"""Round-2 TPU session: one process, three measurements through bench.main():
1. 1graph default (plain M2 heavy phase)     — baseline (prev session: 36.9M)
2. 1graph with the type-split heavy phase    — M2B=auto
3. reads1graph                               — flat batched reads path

One process because the axon remote-compile service stalls multi-minute at
random per process (CLAUDE.md).
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)
import os
import sys
import time

import bench


def run(tag, env):
    saved = dict(os.environ)
    os.environ.update(env)
    t0 = time.time()
    print(f"=== {tag} ===", file=sys.stderr, flush=True)
    try:
        bench.main()
    except Exception as e:  # keep the session alive for the next measurement
        print(f"[{tag}] FAILED: {type(e).__name__}: {e}", file=sys.stderr, flush=True)
    print(f"[{tag}] total {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    os.environ.clear()
    os.environ.update(saved)


def main():
    run("1graph-plain", {"MAZU_BENCH_MODE": "1graph"})
    run("1graph-split", {"MAZU_BENCH_MODE": "1graph", "MAZU_BENCH_M2B": "auto"})
    run("reads1graph", {"MAZU_BENCH_MODE": "reads1graph"})


if __name__ == "__main__":
    main()
