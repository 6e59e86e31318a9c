"""Benchmark: all-sky gas optics + LW/SW solves, columns/s/chip.

Mirrors the reference's benchmark harness (examples/all-sky/
rrtmgp_allsky.F90:329-419: timed iteration loop reporting per-column time)
at production spectral dimensions (LW 256 gpt / SW 224 gpt, 14 temps,
59 pressures).

Structure: a SUPERVISOR (no jax import) forks each benchmark config as a
child process group and watches it. The axon TPU tunnel in this
environment sporadically (a) wedges a process's first device interaction
forever, or (b) fails backend init fast with rc!=0 — either would
otherwise kill the whole benchmark (round-2's BENCH record was lost to
mode (b)). The supervisor kills the child on output stall, retries on
stall OR nonzero exit with cooldown, and relays each config's JSON result
line to stdout the moment it is measured, so partial results always
survive. Every config prints its own JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
The flagship all-sky config is printed first (as soon as measured) and
re-printed as the final line.

The reference publishes no throughput numbers (SURVEY.md section 6), so
vs_baseline is reported against a nominal reference-class GPU throughput
anchor of 1e6 columns/s for the full LW+SW all-sky step.

Env knobs: BENCH_NCOL/NLAY/REPS/INNER (problem size), BENCH_BUDGET_S
(total supervisor wall budget, default 3300), BENCH_PRE_S (stall window
before the child's first device readback succeeds, default 110),
BENCH_STALL_S (stall window after, default 900 — cold Mosaic compiles are
legitimately silent for minutes), BENCH_COOLDOWN_S (between retries,
default 60), BENCH_CONFIGS (comma list to restrict), BENCH_CHILD_CMD
(test hook: full replacement child argv).
"""
import json
import os
import signal
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

CONFIGS = ("allsky", "clear-sky", "aerosols", "rfmip", "podscale")
FLAGSHIP = "allsky"


# ---------------------------------------------------------------------------
# child: the actual measurements (imports jax; may wedge or die — the
# supervisor below handles both)
# ---------------------------------------------------------------------------

def _child_setup():
    import jax

    # persistent compile cache: the grand fused Pallas kernels take minutes
    # to compile cold; cached runs start in seconds (same dir as
    # tests/conftest.py)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    log = lambda m: print(f"# [{time.strftime('%H:%M:%S')}] {m}",
                          file=sys.stderr, flush=True)
    # tiny eager readback first: the axon tunnel sporadically wedges a
    # process's first device interaction; surfacing it here lets the
    # supervisor distinguish "wedged at init" (short stall window) from
    # "legitimately compiling" (long window)
    import numpy as np
    np.asarray(jax.numpy.zeros(8) + 1.0)
    log("device ok")
    return jax, log


def _force(out):
    # one readback forces the serial device queue to drain (through the
    # axon tunnel block_until_ready can return early)
    import jax
    import numpy as np
    np.asarray(jax.device_get(out[0].ravel()[-1:]))


def _time_step(step_jit, inputs, reps, inner, log):
    """Steady-state: chain `inner` steps per timing window so host dispatch
    overlaps device execution (the production regime — the reference
    benchmark also times a loop of steps, rrtmgp_allsky.F90:329-419)."""
    log("compiling/warmup...")
    out = step_jit(inputs)
    _force(out)
    log("warm; timing...")
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = step_jit(inputs)
        _force(out)
        times.append((time.perf_counter() - t0) / inner)
        log(f"rep {r + 1}/{reps}: {times[-1] * 1e3:.2f} ms")
    return min(times)


def _emit(result):
    print(json.dumps(result), flush=True)


def _child_allsky_family(config):
    """allsky (flagship, clouds), clear-sky, aerosols (clouds+aerosols)."""
    jax, log = _child_setup()
    ncol = int(os.environ.get("BENCH_NCOL", "4096"))
    nlay = int(os.environ.get("BENCH_NLAY", "72"))
    reps = int(os.environ.get("BENCH_REPS", "10"))
    inner = int(os.environ.get("BENCH_INNER", "10"))
    kw = {"allsky": {},
          "clear-sky": dict(use_clouds=False),
          "aerosols": dict(use_aerosols=True)}[config]
    from __graft_entry__ import _build
    log(f"building inputs ({config})...")
    step, inputs = _build(ncol=ncol, nlay=nlay, ngpt_lw=256, nbnd_lw=16,
                          ngpt_sw=224, nbnd_sw=14, ntemp=14, npres=59, **kw)
    t_min = _time_step(jax.jit(step), inputs, reps, inner, log)
    cols_per_s = ncol / t_min

    label = {"allsky": "all-sky",
             "clear-sky": "clear-sky",
             "aerosols": "all-sky clouds+aerosols"}[config]
    result = {
        "metric": f"columns/s/chip ({label} gas optics + LW noscat + "
                  f"SW 2-stream, 256/224 gpt)",
        "value": round(cols_per_s, 1),
        "unit": "columns/s",
        "vs_baseline": round(cols_per_s / 1.0e6, 4),
    }
    if config == FLAGSHIP:
        # Roofline accounting (BASELINE.md kernel-efficiency target): the
        # bytes a bandwidth-bound kernel-tier implementation MUST move for
        # this step (table gathers + spectral-field traffic,
        # utils/profiling.step_bytes) divided by the step time = the
        # effective bandwidth at which the problem is processed. The fused
        # kernels keep spectral fields out of HBM entirely, so this can
        # legitimately approach or exceed the device's streaming bandwidth.
        from rte_rrtmgp_tpu.utils.profiling import step_bytes, vpu_cycle_budget

        nbytes = step_bytes(ncol, nlay)
        eff_gbs = nbytes / t_min / 1e9
        bw_spec = float(os.environ.get("BENCH_HBM_GBS", "819"))
        result.update({
            "roofline_model_bytes": nbytes,
            "effective_gbs": round(eff_gbs, 1),
            "roofline_fraction_spec": round(eff_gbs / bw_spec, 4),
        })
        # VPU cycle-budget model (the honest utilization number: the fused
        # kernels are VPU-bound, not bandwidth-bound — see
        # docs/PERFORMANCE.md "cycle budget"). minor_active_frac: the
        # kernels skip whole minor-gas groups on layers entirely on the
        # other side of the tropopause; compute the profile's active
        # fraction (synthetic kdists: 16 lower + 12 upper members,
        # press_ref_trop = 9948 Pa — utils/synthetic.py)
        import numpy as np
        play_h = np.asarray(jax.device_get(inputs.play))
        lo_any = (play_h > 9948.0).any(axis=0)        # per layer
        up_any = (play_h <= 9948.0).any(axis=0)
        frac = (16 * lo_any.mean() + 12 * up_any.mean()) / 28.0
        result.update(vpu_cycle_budget(ncol, nlay, t_min,
                                       minor_active_frac=float(frac)))
    _emit(result)
    print(f"# {config}: ncol={ncol} nlay={nlay} reps={reps} "
          f"t_min={t_min * 1e3:.2f} ms "
          f"time_per_col={t_min / ncol * 1e6:.3f} us "
          f"device={jax.devices()[0]}", file=sys.stderr, flush=True)


def _child_rfmip():
    """RFMIP-shaped clear-sky config at the reference's canonical 1800x61
    size (100 sites x 18 experiments,
    examples/rfmip-clear-sky/CMakeLists.txt:81-99): LW + SW through the
    RFMIP drivers' fused dispatch."""
    jax, log = _child_setup()
    reps = max(3, int(os.environ.get("BENCH_REPS", "10")) // 2)
    from rte_rrtmgp_tpu.drivers.rfmip import rfmip_lw_sw, synthetic_rfmip
    from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
    from rte_rrtmgp_tpu.utils.synthetic import synthetic_kdist

    nsite = int(os.environ.get("BENCH_RFMIP_NSITE", "100"))
    nlay = int(os.environ.get("BENCH_RFMIP_NLAY", "61"))
    nexp = int(os.environ.get("BENCH_RFMIP_NEXP", "18"))
    log("building RFMIP inputs...")
    data = synthetic_rfmip(nsite=nsite, nlay=nlay, nexp=nexp)
    g_lw = GasOpticsRRTMGP(synthetic_kdist(
        sw=False, ngpt=256, nbnd=16, ntemp=14, npres=59))
    g_sw = GasOpticsRRTMGP(synthetic_kdist(
        sw=True, ngpt=224, nbnd=14, ntemp=14, npres=59))
    ncol = data.play.shape[0]

    import numpy as np

    def rf_window(inner):
        # steady-state window: each step is ONE launch; every step's
        # fluxes are read back to host INSIDE the timed window, on a
        # reader thread so the tunnel transfer overlaps the next step's
        # device time (the same threaded pipeline the drivers' block
        # loop uses — a same-thread readback serializes against the
        # next dispatch; scripts/bench_tunnel_overlap.py)
        from concurrent.futures import ThreadPoolExecutor
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=1) as ex:
            futs = [ex.submit(np.asarray,
                              rfmip_lw_sw(data, g_lw, g_sw,
                                          device_out=True))
                    for _ in range(inner)]
            for f in futs:
                f.result()
        return (time.perf_counter() - t0) / inner

    inner = int(os.environ.get("BENCH_INNER", "10"))
    log("compiling/warmup...")
    rf_window(1)
    log("warm; timing...")
    tv = []
    for r in range(reps):
        tv.append(rf_window(inner))
        log(f"rep {r + 1}/{reps}: {tv[-1] * 1e3:.2f} ms")
    t_min = min(tv)
    _emit({
        "metric": f"columns/s/chip (RFMIP {ncol}x{nlay} clear-sky LW+SW, "
                  f"256/224 gpt, via drivers incl. host readback)",
        "value": round(ncol / t_min, 1),
        "unit": "columns/s",
        "vs_baseline": round(ncol / t_min / 1.0e6, 4),
    })
    print(f"# rfmip: ncol={ncol} nlay={nlay} t_min={t_min * 1e3:.2f} ms",
          file=sys.stderr, flush=True)

    # Device-rate line: the same driver dispatch chained with ONE force
    # per window — the chip's RFMIP throughput with the axon tunnel's
    # fixed ~25-30 ms readback round trip amortized (the line above
    # pays it per step; scripts/bench_rfmip_decompose.py separates the
    # components). On a co-located host the first line converges to
    # this one.
    def rf_chain(inner):
        t0 = time.perf_counter()
        out = None
        for _ in range(inner):
            out = rfmip_lw_sw(data, g_lw, g_sw, device_out=True)
        np.asarray(jax.device_get(out.ravel()[-1:]))
        return (time.perf_counter() - t0) / inner
    rf_chain(1)
    tc = min(rf_chain(inner) for _ in range(reps))
    _emit({
        "metric": f"columns/s/chip (RFMIP {ncol}x{nlay} clear-sky LW+SW, "
                  f"256/224 gpt, device-chained driver dispatch)",
        "value": round(ncol / tc, 1),
        "unit": "columns/s",
        "vs_baseline": round(ncol / tc / 1.0e6, 4),
    })
    print(f"# rfmip chained: t={tc * 1e3:.2f} ms", file=sys.stderr,
          flush=True)


def _child_podscale():
    """The pod-scale configuration (BASELINE.md: all-sky scaled to 10M
    columns across the slice), streamed through this process's devices in
    chunks by parallel.scaling.podscale_allsky — on the single bench chip
    a reduced default of 1M columns (~15 s steady state)."""
    jax, log = _child_setup()
    from rte_rrtmgp_tpu.parallel.scaling import podscale_allsky

    total = int(os.environ.get("BENCH_PODSCALE_COLS", "1000000"))
    chunk = int(os.environ.get("BENCH_PODSCALE_CHUNK", "4096"))
    nlay = int(os.environ.get("BENCH_NLAY", "72"))
    log(f"podscale: {total:,} columns...")
    # Two measurements: (a) host-streamed with double buffering — the
    # honest production ingest regime, but through the axon tunnel the
    # host->device link costs a fixed ~25 ms per upload at ~100 MB/s, so
    # it measures the TUNNEL, not the chip (on a co-located host the
    # ~11 MB/chunk upload is <1 ms against a ~35 ms solve and the
    # resident rate is recovered); (b) device-resident inputs — the
    # chip's compute rate for the pod-scale configuration, the primary
    # metric line (emitted LAST so the supervisor records it).
    stream_total = int(os.environ.get("BENCH_PODSCALE_STREAM_COLS",
                                      str(max(total // 10, 4096 * 10))))
    rs = podscale_allsky(total_columns=stream_total, nlay=nlay,
                         chunk_cols_per_device=chunk, stream=True,
                         verbose=False)
    _emit({
        "metric": f"columns/s (pod-scale all-sky, host-streamed "
                  f"double-buffered through the axon tunnel, "
                  f"{rs['n_chunks']} chunks of {rs['chunk_columns']}, "
                  f"{rs['n_devices']} device(s), 256/224 gpt)",
        "value": round(rs["cols_per_s"], 1),
        "unit": "columns/s",
        "vs_baseline": round(rs["cols_per_s"] / 1.0e6, 4),
    })
    print(f"# podscale streamed: {rs}", file=sys.stderr, flush=True)
    r = podscale_allsky(total_columns=total, nlay=nlay,
                        chunk_cols_per_device=chunk, stream=False,
                        verbose=False)
    _emit({
        "metric": f"columns/s (pod-scale all-sky, device-resident "
                  f"inputs, {r['n_chunks']} chunks of "
                  f"{r['chunk_columns']}, {r['n_devices']} device(s), "
                  f"256/224 gpt)",
        "value": round(r["cols_per_s"], 1),
        "unit": "columns/s",
        "vs_baseline": round(r["cols_per_s"] / 1.0e6, 4),
    })
    print(f"# podscale resident: {r}", file=sys.stderr, flush=True)


def child_main(config):
    if config == "rfmip":
        _child_rfmip()
    elif config == "podscale":
        _child_podscale()
    else:
        _child_allsky_family(config)


# ---------------------------------------------------------------------------
# supervisor: wedge-proof runner (NO jax import here)
# ---------------------------------------------------------------------------

def _run_child(config, log_path, pre_s, stall_s, deadline):
    """Run one config attempt under a stall watchdog.

    Returns (rc, json_lines). rc=124 means killed for stalling, rc=125
    killed at the wall `deadline` (a healthy-but-slow child must not eat
    the whole budget and starve the other configs). The stall window is
    `pre_s` until the child logs "device ok" (its first tiny device
    readback — the op the axon wedge freezes), then `stall_s` (long
    Mosaic compiles are legitimately silent for minutes)."""
    if os.environ.get("BENCH_CHILD_CMD"):
        cmd = os.environ["BENCH_CHILD_CMD"].split() + [config]
    else:
        cmd = [sys.executable, os.path.abspath(__file__), "--child", config]
    env = dict(os.environ, PYTHONUNBUFFERED="1")
    with open(log_path, "wb") as log:
        p = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                             start_new_session=True, env=env)
        probed = False
        while True:
            try:
                rc = p.wait(timeout=5)
                break
            except subprocess.TimeoutExpired:
                pass
            if not probed:
                try:
                    with open(log_path, "rb") as f:
                        probed = b"device ok" in f.read()
                except OSError:
                    pass
            window = stall_s if probed else pre_s
            stalled = time.time() - os.path.getmtime(log_path) > window
            overtime = time.time() > deadline
            if stalled or overtime:
                why = (f"stalled ({window}s no output)" if stalled
                       else "wall deadline reached")
                print(f"# bench[{config}]: {why}; killing pg",
                      file=sys.stderr, flush=True)
                try:
                    os.killpg(p.pid, signal.SIGKILL)
                except OSError:
                    p.kill()
                p.wait()
                rc = 124 if stalled else 125
                break
    lines = []
    try:
        with open(log_path, "r", errors="replace") as f:
            for ln in f:
                ln = ln.strip()
                if ln.startswith("{") and ln.endswith("}"):
                    try:
                        lines.append(json.loads(ln))
                    except ValueError:
                        pass
                elif ln:
                    print(f"# [{config}] {ln}" if not ln.startswith("#")
                          else ln, file=sys.stderr, flush=True)
    except OSError:
        pass
    return rc, lines


def supervisor_main():
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "3300"))
    pre_s = float(os.environ.get("BENCH_PRE_S", "110"))
    stall_s = float(os.environ.get("BENCH_STALL_S", "900"))
    cooldown = float(os.environ.get("BENCH_COOLDOWN_S", "60"))
    max_tries = int(os.environ.get("BENCH_TRIES", "6"))
    # per-attempt wall cap: a healthy-but-slow child (it logs every rep,
    # so the stall watchdog never fires) must not starve the remaining
    # configs of the whole budget; generous enough for a cold multi-
    # minute Mosaic compile
    attempt_cap = float(os.environ.get("BENCH_ATTEMPT_CAP_S", "900"))
    want = os.environ.get("BENCH_CONFIGS", "")
    if want and want != "all":
        configs = [c.strip() for c in want.split(",") if c.strip()]
        unknown = [c for c in configs if c not in CONFIGS]
        if unknown or not configs:
            print(f"# bench: unknown BENCH_CONFIGS {unknown or want!r}; "
                  f"valid: {', '.join(CONFIGS)}", file=sys.stderr,
                  flush=True)
            return 2
    else:
        configs = list(CONFIGS)
    t_start = time.time()
    remaining = lambda: budget_s - (time.time() - t_start)
    hard_deadline = t_start + budget_s

    results = {}
    for config in configs:
        # the flagship may consume up to the full budget; secondaries only
        # run while budget remains (flagship-first ordering protects it).
        # If NOTHING has succeeded yet after the first config exhausted its
        # retries, the pool is likely down entirely — probe each remaining
        # config once instead of burning the whole budget on retries.
        tries_here = (1 if (not results and config != configs[0])
                      else max_tries)
        attempt = 0
        while attempt < tries_here and remaining() > pre_s + 10:
            attempt += 1
            log_path = os.path.join(
                "/tmp", f"bench_{config}_a{attempt}_{os.getpid()}.log")
            print(f"# bench[{config}]: attempt {attempt} "
                  f"(budget left {remaining():.0f}s)",
                  file=sys.stderr, flush=True)
            rc, lines = _run_child(
                config, log_path, pre_s, stall_s,
                min(hard_deadline, time.time() + attempt_cap))
            if lines:
                # a measured result counts even if the child then died
                # (e.g. killed during teardown): never discard data
                if rc != 0:
                    print(f"# bench[{config}]: rc={rc} after emitting "
                          f"result; keeping it", file=sys.stderr,
                          flush=True)
                for obj in lines:
                    results[config] = obj
                    # print the moment it is measured so partial results
                    # survive any later wedge
                    print(json.dumps(obj), flush=True)
                break
            print(f"# bench[{config}]: attempt {attempt} failed "
                  f"(rc={rc}, no json lines); cooldown "
                  f"{cooldown:.0f}s", file=sys.stderr, flush=True)
            if remaining() > cooldown + pre_s + 10:
                time.sleep(cooldown)
            else:
                break
        if config not in results:
            print(f"# bench[{config}]: NO RESULT (budget or retries "
                  f"exhausted)", file=sys.stderr, flush=True)

    # re-print the flagship line last: robust to drivers that parse either
    # the first or the last JSON line of stdout
    if FLAGSHIP in results:
        print(json.dumps(results[FLAGSHIP]), flush=True)
    # success = every requested config was measured (the flagship is only
    # required when it was requested, e.g. not under a restricted
    # BENCH_CONFIGS=clear-sky run)
    return 0 if all(c in results for c in configs) else 1


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        child_main(sys.argv[2])
    else:
        sys.exit(supervisor_main())
