"""Audited hardware-limit calibration for the TPU part behind the axon
tunnel (VERDICT round-2 item: the 138 GB/s "measured streaming bandwidth"
was a single-size, dispatch-contaminated figure; the bench's roofline and
VPU-utilization claims divide by these numbers, so they must be clean).

Methodology — every number separates DISPATCH from DEVICE time by the
slope method: for a chain of K dependent in-jit iterations of the same
op (single dispatch, K x work), time(K) = dispatch + K * t_op; linear
regression over K in {1, 2, 4, 8} yields t_op as the slope, immune to
the ~1.6-1.9 ms/call tunnel dispatch overhead and the ~30 ms readback.

  1. streaming bandwidth across sizes 64 MB -> 2 GB (elementwise
     x*a+b: bytes = 2 x size per iteration),
  2. dispatch overhead (trivial jit chain),
  3. VPU elementwise VREG-op throughput (Pallas kernel, P independent
     mul-add chains on VMEM-resident tiles, N loop iterations -> slope
     over N; reported as f32 VREG-ops/s and, at an assumed issue width,
     implied clock),
  4. cross-lane gather throughput (Pallas kernel gathering R rows per
     iteration -> rows/s; the fused kernels' dominant primitive,
     previously measured ~2 cycles/row).

Each result prints as a JSON line; run under scripts/tpu_run.py.
Writes nothing — paste the numbers into docs/PERFORMANCE.md and use
BENCH_VPU_GHZ / BENCH_HBM_MEASURED_GBS to feed bench.py.
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def force(out):
    np.asarray(jax.device_get(out.ravel()[-1:]))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def time_k(build_fn, ks=(1, 4, 8, 16), reps=7):
    """min-over-reps wall time of build_fn(k) for each chain length k,
    then the regression slope (s per unit k) and intercept (dispatch).
    The readback through the axon tunnel costs ~30 ms with +-5 ms jitter,
    so per-unit-k device work must be >= ~2 ms for a clean slope —
    callers size their inner loops accordingly."""
    ts = []
    for k in ks:
        fn = build_fn(k)
        out = fn()
        force(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            force(out)
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    ks_a = np.asarray(ks, np.float64)
    ts_a = np.asarray(ts, np.float64)
    slope, intercept = np.polyfit(ks_a, ts_a, 1)
    return float(slope), float(intercept), ts


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    x0 = jnp.zeros(8) + 1.0
    force(x0)
    print("# device ok", file=sys.stderr, flush=True)

    # ---- 2. dispatch overhead (trivial op, K chained jit CALLS) ----
    triv = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8, 128), jnp.float32)
    force(triv(z))
    for k in (1, 8, 32):
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            o = z
            for _ in range(k):
                o = triv(o)
            force(o)
            best = min(best, time.perf_counter() - t0)
        emit(measure="dispatch_chain", calls=k, total_ms=round(best * 1e3, 3),
             per_call_ms=round(best / k * 1e3, 3))

    # ---- 1. streaming bandwidth vs size (slope method, single dispatch) --
    for mb in (64, 256, 1024, 2048):
        n = mb * 1024 * 1024 // 4
        x = jnp.ones((n,), jnp.float32)

        def build(k):
            @jax.jit
            def run(x):
                def body(i, v):
                    return v * 1.000001 + 1e-7
                return jax.lax.fori_loop(0, k, body, x)
            run_c = functools.partial(run, x)
            return run_c

        slope, icpt, ts = time_k(build)
        bw = 2 * n * 4 / slope / 1e9 if slope > 0 else float("nan")
        emit(measure="stream_bw", size_mb=mb,
             slope_ms=round(slope * 1e3, 3),
             dispatch_intercept_ms=round(icpt * 1e3, 3),
             gbs=round(bw, 1),
             raw_ms=[round(t * 1e3, 3) for t in ts])

    # ---- 3. VPU elementwise VREG-op throughput (Pallas) ----
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = os.environ.get("CAL_INTERPRET", "0") == "1"  # CPU smoke
    ROWS = 256           # 32 VREGs of (8, 128) f32 per op
    GRID = 64
    # iterations per unit k: sized so one unit of k is ~2-5 ms of device
    # work (>= the tunnel's readback jitter); 2048 iters x 32 VREG FMAs x
    # 64 blocks = 4.2M VREG-FMAs per unit k
    VPU_ITERS = 64 if interpret else 2048

    def vpu_kernel(x_ref, o_ref, *, n):
        def body(i, v):
            # one VREG FMA per iteration per VREG (mul + add contract);
            # independent across the 32 VREGs of the tile, serially
            # dependent across iterations — 32 chains hide FMA latency
            return v * 1.000001 + 1e-7
        o_ref[:, :] = jax.lax.fori_loop(0, n, body, x_ref[:, :])

    def build_vpu(k):
        kern = functools.partial(vpu_kernel, n=k * VPU_ITERS)
        f = pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((GRID * ROWS, 128), jnp.float32),
            interpret=interpret,
        )
        xb = jnp.ones((GRID * ROWS, 128), jnp.float32)
        jf = jax.jit(f)
        return functools.partial(jf, xb)

    slope, icpt, ts = time_k(build_vpu)
    # per k: VPU_ITERS iters x 32 VREGs x GRID blocks, 1 FMA each (the
    # mul+add contracts; count it as ONE issued VREG op)
    vregops = VPU_ITERS * (ROWS // 8) * GRID
    rate = vregops / slope if slope > 0 else float("nan")
    emit(measure="vpu_vregops", slope_ms=round(slope * 1e3, 3),
         dispatch_intercept_ms=round(icpt * 1e3, 3),
         vreg_fmas_per_s=f"{rate:.3e}",
         implied_clock_ghz_at_1_per_cycle=round(rate / 1e9, 3),
         # if Mosaic does NOT contract v*a+b into one FMA the true issue
         # rate is 2x this figure (two VREG ops per iteration); both
         # bounds are reported rather than assuming the contraction
         # (ADVICE r3). The cycle model keys off the measured RATE per
         # source-counted mul-or-add, which is insensitive to the split.
         implied_clock_ghz_at_2_ops_per_iter=round(rate * 2 / 1e9, 3),
         raw_ms=[round(t * 1e3, 3) for t in ts])

    # ---- 4. cross-lane gather throughput (rows/s) ----
    TROWS = 32           # table rows gathered per _gather_rows call

    def gather_kernel(t_ref, i_ref, o_ref, *, n):
        idx = i_ref[0, :]
        def body(j, v):
            ix = jnp.broadcast_to(
                ((idx + j) % 128)[None, :], (TROWS, 128))
            g = jnp.take_along_axis(t_ref[:, :], ix, axis=1)
            return v + g
        o_ref[:, :] = jax.lax.fori_loop(0, n, body,
                                        jnp.zeros((TROWS, 128), jnp.float32))

    # 2048 iters x 32 rows x 64 blocks = 4.2M rows per unit k (~9 ms at
    # the previously-measured ~2 cycles/row)
    GATHER_ITERS = 64 if interpret else 2048

    def build_gather(k):
        kern = functools.partial(gather_kernel, n=k * GATHER_ITERS)
        f = pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((TROWS, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TROWS, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((GRID * TROWS, 128), jnp.float32),
            interpret=interpret,
        )
        tab = jnp.ones((TROWS, 128), jnp.float32)
        idx = jnp.arange(128, dtype=jnp.int32).reshape(1, 128)
        jf = jax.jit(f)
        return functools.partial(jf, tab, idx)

    slope, icpt, ts = time_k(build_gather)
    rows = GATHER_ITERS * TROWS * GRID  # rows gathered per unit k (+1 add)
    rate = rows / slope if slope > 0 else float("nan")
    emit(measure="gather_rows", slope_ms=round(slope * 1e3, 3),
         dispatch_intercept_ms=round(icpt * 1e3, 3),
         rows_per_s=f"{rate:.3e}",
         raw_ms=[round(t * 1e3, 3) for t in ts])

    # ---- 4b. KERNEL-SHAPED gather: exactly the fused kernels' inner
    # pattern (ops/pallas/fused_sw.py pres_of_it): per iteration, for
    # it in {0,1}: g0 = gather(slab, te), g1 = gather(slab, te+1), then
    # the eta lerp (1-fe)*g0 + fe*g1 and an fma accumulate. Index rows
    # come from VMEM (not recomputed), slab is 2*w rows like the
    # pre-lerped slab2. Reports rows/s for THIS mix so the cycle model
    # can use a rate measured under kernel-like conditions (amortizing
    # the lerp/accumulate ops the kernels also issue per gather pair).
    W = 16
    SLABR = 2 * W

    def kgather_kernel(tab_ref, i_ref, f_ref, o_ref, *, n):
        def body(j, acc):
            for it in range(2):
                te = i_ref[it, :] + (j % 8)          # vary rows a little
                fe = f_ref[it, :][None, :]
                g0 = _kg(tab_ref, te)
                g1 = _kg(tab_ref, te + 1)
                acc = acc + (1.0 - fe) * g0 + fe * g1
            return acc
        o_ref[:, :] = jax.lax.fori_loop(
            0, n, body, jnp.zeros((W, _last), jnp.float32))

    _last = 128

    def _kg(tab_ref, rows):
        idx = jnp.broadcast_to(rows[None, :], (W, 128))
        return jnp.take_along_axis(tab_ref[:W, :], idx, axis=1)

    KG_ITERS = 64 if interpret else 1024

    def build_kgather(k):
        kern = functools.partial(kgather_kernel, n=k * KG_ITERS)
        f = pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((SLABR, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((2, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((2, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((W, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((GRID * W, 128), jnp.float32),
            interpret=interpret,
        )
        tab = jnp.ones((SLABR, 128), jnp.float32)
        idx = jnp.tile(jnp.arange(16, dtype=jnp.int32)[None, :], (2, 8))
        fe = jnp.full((2, 128), 0.3, jnp.float32)
        jf = jax.jit(f)
        return functools.partial(jf, tab, idx, fe)

    slope, icpt, ts = time_k(build_kgather)
    # per unit k: KG_ITERS x 2 its x 2 gathers x W rows x GRID blocks
    rows = KG_ITERS * 2 * 2 * W * GRID
    rate = rows / slope if slope > 0 else float("nan")
    emit(measure="gather_rows_kernel_shaped", slope_ms=round(slope * 1e3, 3),
         dispatch_intercept_ms=round(icpt * 1e3, 3),
         rows_per_s=f"{rate:.3e}",
         note="includes the eta-lerp fma per gather pair, fused-kernel mix",
         raw_ms=[round(t * 1e3, 3) for t in ts])

    # ---- 4c. ILP-rich gather: like 4b but FOUR independent
    # chains per iteration (the fused kernels' layer loop has no serial
    # dependence between layers, so the hardware sees far more
    # independent gathers than a single-accumulator microbench exposes;
    # this measures the ISSUE-throughput bound the kernels actually
    # face). 4 chains x (2 gathers + lerp) per iteration.
    def kgather4_kernel(tab_ref, i_ref, f_ref, o_ref, *, n):
        def body(j, accs):
            out = []
            for c, acc in enumerate(accs):
                te = i_ref[c % 2, :] + ((j + c) % 8)
                fe = f_ref[c % 2, :][None, :]
                g0 = _kg(tab_ref, te)
                g1 = _kg(tab_ref, te + 1)
                out.append(acc + (1.0 - fe) * g0 + fe * g1)
            return tuple(out)
        z = jnp.zeros((W, _last), jnp.float32)
        accs = jax.lax.fori_loop(0, n, body, (z, z, z, z))
        o_ref[:, :] = accs[0] + accs[1] + accs[2] + accs[3]

    KG4_ITERS = 32 if interpret else 512

    def build_kgather4(k):
        kern = functools.partial(kgather4_kernel, n=k * KG4_ITERS)
        f = pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((SLABR, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((2, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((2, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((W, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((GRID * W, 128), jnp.float32),
            interpret=interpret,
        )
        tab = jnp.ones((SLABR, 128), jnp.float32)
        idx = jnp.tile(jnp.arange(16, dtype=jnp.int32)[None, :], (2, 8))
        fe = jnp.full((2, 128), 0.3, jnp.float32)
        jf = jax.jit(f)
        return functools.partial(jf, tab, idx, fe)

    slope, icpt, ts = time_k(build_kgather4)
    rows = KG4_ITERS * 4 * 2 * W * GRID
    rate = rows / slope if slope > 0 else float("nan")
    emit(measure="gather_rows_ilp4", slope_ms=round(slope * 1e3, 3),
         dispatch_intercept_ms=round(icpt * 1e3, 3),
         rows_per_s=f"{rate:.3e}",
         note="4 independent gather+lerp chains per iteration",
         raw_ms=[round(t * 1e3, 3) for t in ts])

    # ---- 5. transcendental throughput (exp, divide) ----
    def trans_kernel(x_ref, o_ref, *, n, op):
        def body(i, v):
            if op == "exp":
                return jnp.exp(v * -1e-6)            # stays ~1
            return 1.0 / (v + 0.5)                   # cycles around fixed pt
        o_ref[:, :] = jax.lax.fori_loop(0, n, body, x_ref[:, :])

    TR_ITERS = 64 if interpret else 512
    for op in ("exp", "div"):
        def build_tr(k, op=op):
            kern = functools.partial(trans_kernel, n=k * TR_ITERS, op=op)
            f = pl.pallas_call(
                kern,
                grid=(GRID,),
                in_specs=[pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((GRID * ROWS, 128),
                                               jnp.float32),
                interpret=interpret,
            )
            xb = jnp.ones((GRID * ROWS, 128), jnp.float32)
            jf = jax.jit(f)
            return functools.partial(jf, xb)

        slope, icpt, ts = time_k(build_tr)
        # per unit k: TR_ITERS x 32 VREGs x GRID (one transcendental + one
        # cheap mul/add each)
        vops = TR_ITERS * (ROWS // 8) * GRID
        rate = vops / slope if slope > 0 else float("nan")
        emit(measure=f"vpu_{op}", slope_ms=round(slope * 1e3, 3),
             dispatch_intercept_ms=round(icpt * 1e3, 3),
             vreg_ops_per_s=f"{rate:.3e}",
             raw_ms=[round(t * 1e3, 3) for t in ts])


if __name__ == "__main__":
    main()
