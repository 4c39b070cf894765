"""bench.py emission/budget protocol tests (VERDICT r4 item 1).

The round-4 BENCH artifact went red because bench.py printed one JSON
line only at the very end; a driver timeout erased every number already
measured. These tests pin the fixed protocol: the headline JSON is
emitted as soon as it is measured, later sections enrich it
incrementally under a wall-clock budget, and a starved budget yields
explicit ``skipped (budget)`` sections — never a silent empty stdout.
"""
from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _load_bench_module():
    spec = importlib.util.spec_from_file_location("bench_mod", BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _json_lines(stdout: str) -> list[dict]:
    out = []
    for line in stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            out.append(json.loads(line))
    return out


def test_starved_budget_still_emits_headline():
    """NERF_QA_TPU_BENCH_BUDGET_S=0: the headline JSON appears and every
    optional section is an explicit budget skip."""
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               NERF_QA_TPU_BENCH_BUDGET_S="0",
               NERF_QA_TPU_COMPILE_CACHE="0")
    proc = subprocess.run(
        [sys.executable, BENCH, "--tiny"], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = _json_lines(proc.stdout)
    assert lines, f"no JSON on stdout:\n{proc.stdout}"
    for res in lines:  # every emission is a complete headline record
        assert res["metric"] == "1080p_frames_per_sec_per_chip_dists"
        assert res["value"] > 0
        assert res["unit"] == "frames/s"
        assert res["vs_baseline"] == pytest.approx(res["value"] / 500.0,
                                                   rel=1e-3)
    final = lines[-1]
    sections = final["detail"]["sections"]
    assert sections["headline"]["status"] == "ok"
    optional = [k for k in sections if k != "headline"]
    assert optional, "no optional sections recorded"
    assert all(sections[k]["status"] == "skipped (budget)"
               for k in optional), sections
    # stdout carries only JSON lines (progress goes to stderr)
    assert all(ln.strip().startswith("{")
               for ln in proc.stdout.splitlines() if ln.strip())


def test_run_section_records_error_and_continues():
    mod = _load_bench_module()
    b = mod.Bench(budget_s=100.0)
    b.result = {"metric": "m", "value": 1, "unit": "u", "vs_baseline": 0}

    def boom():
        raise ValueError("nope")

    b.run_section("bad", 0.0, boom)
    assert b.sections["bad"]["status"] == "error"
    assert "ValueError" in b.sections["bad"]["error"]

    hit = []
    b.run_section("good", 0.0, lambda: hit.append(1))
    assert hit and b.sections["good"]["status"] == "ok"
    assert b.sections["good"]["elapsed_s"] >= 0


def test_run_json_subprocess_parses_last_line_and_timeout():
    mod = _load_bench_module()
    b = mod.Bench(budget_s=100.0)
    res, rc = b.run_json_subprocess(
        [sys.executable, "-c",
         "print('progress junk'); print('{\"a\": 1}'); print('{\"a\": 2}')"],
        timeout_s=30,
    )
    assert rc == 0 and res == {"a": 2}

    # a hung child: partial stdout survives the timeout
    res, rc = b.run_json_subprocess(
        [sys.executable, "-u", "-c",
         "import time; print('{\"partial\": true}', flush=True); "
         "time.sleep(60)"],
        timeout_s=3,
    )
    assert rc == "timeout" and res == {"partial": True}


def test_bench_feed_tiny_dists_modes():
    """bench_feed sustains its cumulative-emission contract in tiny mode
    (the DISTS jpeg + uint8-cache feeds)."""
    from nerf_qa_tpu.data import native

    if not native.available():
        pytest.skip("native decoder not built")
    from nerf_qa_tpu.tools import bench_feed

    emitted = []
    res = bench_feed.run(
        tiny=True,
        modes=("dists_jpeg", "dists_uint8_cache"),
        emit=lambda r: emitted.append(json.dumps(r)),
    )
    assert res["fps_dists_jpeg"] > 0
    assert res["fps_dists_uint8_cache"] > 0
    assert res["uint8_cache_build_s"] >= 0
    # one cumulative emission per completed mode, each valid JSON
    assert len(emitted) == 2
    assert json.loads(emitted[0]).keys() <= json.loads(emitted[-1]).keys()


@pytest.mark.slow
def test_bench_feed_tiny_nr_token_mode():
    """The cached-token NR feed (--feature-cache path) end to end."""
    from nerf_qa_tpu.data import native

    if not native.available():
        pytest.skip("native decoder not built")
    from nerf_qa_tpu.tools import bench_feed

    res = bench_feed.run(tiny=True, modes=("nr_tokens",))
    assert res["fps_nr_tokens"] > 0
