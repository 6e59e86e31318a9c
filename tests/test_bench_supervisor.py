"""The bench.py supervisor must survive the axon tunnel's two failure
modes — fast backend-init death (rc!=0) and a first-device-op wedge
(infinite stall) — and still capture every config's JSON line it can.

Round-2's benchmark record was lost to the rc!=0 mode (BENCH_r02.json);
these tests drive the supervisor with fake children (BENCH_CHILD_CMD)
so the retry/stall/partial-result machinery is CI-verified without TPU
hardware. Reference analogue: the reliable timed harness of
examples/all-sky/rrtmgp_allsky.F90:329-419.
"""
import json
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _fake_child(tmp_path, body):
    p = tmp_path / "fake_child.py"
    p.write_text(textwrap.dedent(body))
    return f"{sys.executable} {p}"


def _run_supervisor(child_cmd, configs="allsky,clear-sky", budget="60",
                    pre_s="3", stall_s="3", cooldown="0"):
    env = dict(os.environ,
               BENCH_CHILD_CMD=child_cmd,
               BENCH_CONFIGS=configs,
               BENCH_BUDGET_S=budget,
               BENCH_PRE_S=pre_s,
               BENCH_STALL_S=stall_s,
               BENCH_COOLDOWN_S=cooldown)
    r = subprocess.run([sys.executable, BENCH], capture_output=True,
                       text=True, env=env, timeout=120)
    lines = [json.loads(ln) for ln in r.stdout.splitlines()
             if ln.strip().startswith("{")]
    return r.returncode, lines, r.stderr


def test_retries_fast_init_failure_then_succeeds(tmp_path):
    """rc!=0 on the first attempt (the BENCH_r02 failure mode) must be
    retried; the result line is still captured."""
    marker = tmp_path / "attempt"
    child = _fake_child(tmp_path, f"""
        import json, os, sys
        m = {str(marker)!r} + sys.argv[1]
        if not os.path.exists(m):
            open(m, "w").write("x")
            sys.stderr.write("RuntimeError: Unable to initialize backend"
                             " 'axon': UNAVAILABLE\\n")
            sys.exit(1)
        print("# device ok", file=sys.stderr)
        print(json.dumps({{"metric": "m-" + sys.argv[1], "value": 1.0,
                           "unit": "columns/s", "vs_baseline": 0.1}}))
    """)
    rc, lines, err = _run_supervisor(child)
    assert rc == 0, err
    metrics = [l["metric"] for l in lines]
    assert "m-allsky" in metrics and "m-clear-sky" in metrics
    # flagship line re-printed last (robust to first- or last-line parsers)
    assert lines[0]["metric"] == "m-allsky"
    assert lines[-1]["metric"] == "m-allsky"


def test_kills_wedged_child_and_retries(tmp_path):
    """A child that wedges before its first device op (never prints
    "device ok") must be killed at the short pre-probe window, then the
    retry succeeds."""
    marker = tmp_path / "wedged"
    child = _fake_child(tmp_path, f"""
        import json, os, sys, time
        m = {str(marker)!r}
        if not os.path.exists(m):
            open(m, "w").write("x")
            time.sleep(3600)   # the wedge: silent forever
        print("# device ok", file=sys.stderr)
        print(json.dumps({{"metric": "m", "value": 2.0,
                           "unit": "columns/s", "vs_baseline": 0.2}}))
    """)
    rc, lines, err = _run_supervisor(child, configs="allsky")
    assert rc == 0, err
    assert lines and lines[0]["value"] == 2.0
    assert "stalled" in err


def test_partial_results_survive_flagship_failure(tmp_path):
    """If the flagship config never succeeds, secondary results are still
    printed (partial capture) and the exit code is nonzero."""
    child = _fake_child(tmp_path, """
        import json, sys
        if sys.argv[1] == "allsky":
            sys.exit(1)
        print("# device ok", file=sys.stderr)
        print(json.dumps({"metric": "m-" + sys.argv[1], "value": 3.0,
                          "unit": "columns/s", "vs_baseline": 0.3}))
    """)
    rc, lines, err = _run_supervisor(child, budget="90")
    assert rc == 1
    assert [l["metric"] for l in lines] == ["m-clear-sky"]


def test_budget_bounds_total_runtime(tmp_path):
    """A permanently-failing child must not exceed the wall budget."""
    import time
    child = _fake_child(tmp_path, "import sys; sys.exit(1)")
    t0 = time.time()
    rc, lines, _ = _run_supervisor(child, configs="allsky", budget="6",
                                   pre_s="1", stall_s="1", cooldown="1")
    assert rc == 1 and not lines
    assert time.time() - t0 < 30


def test_vpu_cycle_budget_fields():
    """The flagship roofline JSON carries the VPU cycle-budget model
    (docs/PERFORMANCE.md 'cycle budget'; an MFU-style utilization)."""
    from rte_rrtmgp_tpu.utils.profiling import vpu_cycle_budget
    out = vpu_cycle_budget(4096, 72, 49.3e-3)
    # an audited floor over measured primitive rates must be a true
    # utilization: strictly positive and <= 1 against the round-3
    # measured step (37.4 ms) and anything slower
    assert 0.0 < out["vpu_utilization"] <= 1.0, out
    assert out["vpu_model_time_ms"] > 0
    # floor components: LW and SW contributions both present and of the
    # same order as the standalone kernel measurements (docs/PERFORMANCE)
    assert 5.0 < out["vpu_model_lw_ms"] < 40.0
    assert 5.0 < out["vpu_model_sw_ms"] < 40.0
    assert out["vpu_rate_gather_rows_per_s"] > 1e8


@pytest.mark.parametrize("config", ["allsky", "rfmip"])
def test_bench_child_runs_on_cpu(config):
    """The real bench child code (the exact code the driver runs on TPU)
    executes end-to-end on the CPU/XLA path at tiny sizes and emits a
    valid JSON result line — so a NameError/refactor break in bench.py's
    measurement code fails CI, not the round's perf capture."""
    env = dict(os.environ,
               BENCH_NCOL="128", BENCH_NLAY="8",
               BENCH_REPS="1", BENCH_INNER="1",
               BENCH_RFMIP_NSITE="4", BENCH_RFMIP_NLAY="8",
               BENCH_RFMIP_NEXP="2",
               JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run([sys.executable, BENCH, "--child", config],
                       capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(ln) for ln in r.stdout.splitlines()
             if ln.strip().startswith("{")]
    # rfmip emits two lines (driver-with-readback + device-chained)
    assert len(lines) == (2 if config == "rfmip" else 1)
    assert all(o["value"] > 0 and o["unit"] == "columns/s" for o in lines)
    if config == "allsky":
        assert 0.0 < lines[0]["vpu_utilization"]       # cycle-budget fields
        assert lines[0]["roofline_model_bytes"] > 0
