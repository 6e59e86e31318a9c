"""Gradient-based atmospheric retrieval — a capability the reference
cannot express.

The whole framework is differentiable (ops/pallas/autodiff.py custom
VJPs make even the fused Pallas kernels transparent to jax.grad), so an
inverse problem becomes a few lines: given "observed" broadband LW
fluxes, retrieve the surface temperature and a water-vapor scaling by
gradient descent through RRTMGP gas optics + the no-scattering solve.

Run:  python examples/gradient_retrieval.py  (CPU or TPU)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(ncol=8, nlay=16, steps=120, verbose=True):
    from rte_rrtmgp_tpu import rte_lw
    from rte_rrtmgp_tpu.drivers.allsky import make_allsky_inputs
    from rte_rrtmgp_tpu.models.rrtmgp.gas_optics import GasOpticsRRTMGP
    from rte_rrtmgp_tpu.utils.synthetic import synthetic_kdist

    gas = GasOpticsRRTMGP(synthetic_kdist(sw=False, ngpt=32, nbnd=4,
                                          ntemp=5, npres=10))
    inp = make_allsky_inputs(ncol, nlay)
    emis = jnp.ones((ncol, 1), jnp.float32)
    h2o_true = inp.gas_concs.get_vmr("h2o", ncol, nlay)

    def forward(tsfc, log_h2o_scale):
        gc = inp.gas_concs.set_vmr("h2o",
                                   h2o_true * jnp.exp(log_h2o_scale))
        props, src = gas.gas_optics_lw(inp.play, inp.plev, inp.tlay,
                                       tsfc, gc, tlev=inp.tlev)
        f = rte_lw(props, src, emis)
        return f.flux_up, f.flux_dn

    # synthetic truth, perturbed first guess
    obs_up, obs_dn = forward(inp.tsfc, jnp.asarray(0.0, jnp.float32))
    tsfc0 = inp.tsfc + 8.0
    ls0 = jnp.asarray(0.4, jnp.float32)     # 49% too much water vapor

    @jax.jit
    def loss(tsfc, log_h2o_scale):
        up, dn = forward(tsfc, log_h2o_scale)
        return jnp.mean((up - obs_up) ** 2) + jnp.mean((dn - obs_dn) ** 2)

    try:
        import optax
        opt = optax.adam(0.2)
        apply_updates = optax.apply_updates
    except ImportError:      # optional dependency (pyproject [examples])
        # minimal Adam so the example is self-contained without optax
        import types
        b1, b2, lr, eps = 0.9, 0.999, 0.2, 1e-8

        def init(params):
            z = jax.tree_util.tree_map(jnp.zeros_like, params)
            return (z, z, jnp.zeros((), jnp.int32))

        def update(g, state, params=None):
            m, v, t = state
            t = t + 1
            m = jax.tree_util.tree_map(lambda a, b: b1 * a + (1 - b1) * b,
                                       m, g)
            v = jax.tree_util.tree_map(
                lambda a, b: b2 * a + (1 - b2) * b * b, v, g)
            bc1 = 1 - b1 ** t.astype(jnp.float32)
            bc2 = 1 - b2 ** t.astype(jnp.float32)
            upd = jax.tree_util.tree_map(
                lambda mm, vv: -lr * (mm / bc1)
                / (jnp.sqrt(vv / bc2) + eps), m, v)
            return upd, (m, v, t)

        opt = types.SimpleNamespace(init=init, update=update)
        apply_updates = lambda p, u: jax.tree_util.tree_map(
            lambda a, b: a + b, p, u)

    params = (tsfc0, ls0)
    state = opt.init(params)

    @jax.jit
    def update(params, state):
        g = jax.grad(lambda p: loss(*p))(params)
        upd, state = opt.update(g, state)
        return apply_updates(params, upd), state

    for i in range(steps):
        params, state = update(params, state)
        if verbose and i % 10 == 0:
            tsfc, ls = params
            print(f"step {i:3d}: loss={float(loss(tsfc, ls)):.4e} "
                  f"T_err={float(jnp.abs(tsfc - inp.tsfc).max()):.3f} K "
                  f"h2o_scale={float(jnp.exp(ls)):.4f}")
    tsfc, ls = params
    t_err = float(jnp.abs(tsfc - inp.tsfc).max())
    s_err = abs(float(jnp.exp(ls)) - 1.0)
    if verbose:
        print(f"retrieved: max T_sfc error {t_err:.3f} K "
              f"(started at 8 K), h2o scale error {s_err:.4f} "
              f"(started at 0.49)")
    return t_err, s_err


if __name__ == "__main__":
    main()
