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


@pytest.mark.slow
def test_bench_capacity_tier_smoke(tmp_path):
    """The multi-tier bench tail (round 4): a tiny synthetic direct-engine
    ckpt drives _emit_capacity_tier after the 1graph headline; both metric
    lines must appear and the capacity pass is ground-truth exact."""
    import sys as _sys

    _sys.path.insert(0, ROOT)
    import bench
    from mazu_tpu.index.modindex import ModIndex
    from mazu_tpu.io.checkpoint import save_index
    from mazu_tpu.kphf.sshash import SSHash

    unitigs, refs, u2pos = bench.build_synthetic(2_000_000)
    k2u = SSHash.from_unitig_set(
        unitigs, w=15, skew_param=64, engine="direct", bucket_load=0.5
    )
    ck = str(tmp_path / "cap2m.npz")
    save_index(ModIndex(k2u, u2pos, refs, index_type="Piscem-synth"), ck, compress=False)

    env = dict(os.environ)
    env.update(
        MAZU_BENCH_CPU="1", MAZU_BENCH_CACHE="0", MAZU_BENCH_ITERS="1",
        MAZU_BENCH_MODE="1graph", MAZU_BENCH_BATCH=str(1 << 14),
        MAZU_BENCH_CHUNKS="2", MAZU_BENCH_TIERS="1",
        MAZU_BENCH_CAPACITY_CKPT=ck, MAZU_BENCH_CAP_B=str(1 << 14),
        MAZU_BENCH_CAP_CH="2", MAZU_BENCH_CAP_ITERS="1",
        MAZU_BENCH_READS="64",
    )
    p = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, timeout=420, env=env, cwd=ROOT,
    )
    assert p.returncode == 0, p.stderr[-3000:]
    outs = [json.loads(ln) for ln in p.stdout.splitlines() if ln.startswith("{")]
    metrics = {o["metric"] for o in outs}
    assert "kmer_queries_per_sec_per_chip_yeast_chr01" in metrics, metrics
    assert "capacity_tier_kmer_queries_per_sec_2Mbp" in metrics, metrics
    assert "serve_read_kmers_per_sec_end_to_end" in metrics, metrics
