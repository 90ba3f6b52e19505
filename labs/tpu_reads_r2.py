"""Round-2 TPU session #14: streaming-cache device scan + CH=512 probe.

(a) MAZU_BENCH_MODE=readscache — StreamingIndex(device_scan=True): the
    reference k-mer-cache semantics as ONE lax.scan graph; measures
    read-kmers/s on chip (2048 x 150bp reads, chr01).
(b) headline probe: CH=512 (vs 256 -> 104.5M).

Run: timeout 3000 python tpu_reads_r2.py > /tmp/tpu_reads_r2.out 2>&1
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
        ("readscache 2048 reads", {"MAZU_BENCH_MODE": "readscache"}),
        ("1graph CH=512", {"MAZU_BENCH_MODE": "1graph", "MAZU_BENCH_CHUNKS": "512"}),
        (
            "synth50M mono2 L=0.25 CH=8",  # L=0.5/CH=16 gave 29.8M; the
            # 7.67GB L=0.25 table OOM'd at CH=32 — retry with tiny stack
            {
                "MAZU_BENCH_MODE": "1graph",
                "MAZU_BENCH_SYNTH": "50000000",
                "MAZU_BENCH_REFS": "5000",
                "MAZU_BENCH_ENGINE": "mono2",
                "MAZU_BENCH_LOAD": "0.25",
                "MAZU_BENCH_CHUNKS": "8",
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
