"""Round-2 TPU session #3: fixedcap2 (direct-addressed pre-aligned rows —
no bucket-bounds/prefix gather) vs inline2 in the one-graph driver, at
probe-limit 2 and 1, plus reads on the winner. One process (remote-compile
stalls are per-process; CLAUDE.md).
Run: timeout 3000 python tpu_fc2_r2.py > /tmp/tpu_fc2_r2.out 2>&1
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
    run("1graph-fc2-plim2", {"MAZU_BENCH_MODE": "1graph", "MAZU_BENCH_POS": "fixedcap2"})
    run(
        "1graph-fc2-plim1",
        {"MAZU_BENCH_MODE": "1graph", "MAZU_BENCH_POS": "fixedcap2", "MAZU_BENCH_PLIM": "1"},
    )
    run(
        "1graph-inline2-plim1",
        {"MAZU_BENCH_MODE": "1graph", "MAZU_BENCH_PLIM": "1"},
    )
    run(
        "reads-fc2-1M",
        {
            "MAZU_BENCH_MODE": "reads1graph",
            "MAZU_BENCH_POS": "fixedcap2",
            "MAZU_BENCH_BATCH": str(1 << 20),
            "MAZU_BENCH_CHUNKS": "8",
        },
    )


if __name__ == "__main__":
    main()
