"""Slow-lane smoke tests: the bench driver's entry modes must run
end-to-end on CPU with tiny shapes and emit their JSON metric line.
These protect bench.py (which the round driver executes on real
hardware) against import-time or wiring regressions."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(env_extra, timeout=420):
    env = dict(os.environ)
    env.update(
        MAZU_BENCH_CPU="1",
        MAZU_BENCH_CACHE="0",
        MAZU_BENCH_ITERS="1",
        **env_extra,
    )
    p = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=ROOT,
    )
    assert p.returncode == 0, p.stderr[-3000:]
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    assert out["value"] > 0 and out["unit"] == "queries/s"
    return out


@pytest.mark.slow
def test_bench_serve_smoke():
    out = _run_bench(
        {"MAZU_BENCH_MODE": "serve", "MAZU_BENCH_READS": "64",
         "MAZU_BENCH_CHUNKS": "2"}
    )
    assert out["metric"] == "serve_read_kmers_per_sec_end_to_end"


@pytest.mark.slow
def test_bench_1graph_smoke():
    out = _run_bench(
        {"MAZU_BENCH_MODE": "1graph", "MAZU_BENCH_BATCH": str(1 << 14),
         "MAZU_BENCH_CHUNKS": "2"}
    )
    assert "queries_per_sec" in out["metric"]
