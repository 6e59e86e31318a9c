#!/usr/bin/env python
"""Render solver-variant validation plots from a flux-variants file.

Equivalent of the reference's tests/validation-plots.py (registered at
tests/CMakeLists.txt:122-131): reads the variant flux file written by
examples/flux_variants.py and renders per-variant flux-difference
profiles against the default solve, plus the flux and heating-rate
profiles themselves, to one PNG.

Usage:
  python examples/flux_variants.py --out lw_flux_variants.nc
  python examples/validation_plots.py lw_flux_variants.nc [out.png]

Chart conventions: one y-axis per panel (level index, top of atmosphere
at 0, inverted so "up" is up); variants carry a FIXED colorblind-safe
categorical order (Okabe-Ito subset, adjacent-pair CVD separation
verified in OKLab); thin 1.8px lines; recessive grid; legend present
for multi-series panels.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# fixed categorical order (never cycled): verified adjacent-pair CVD
# separation >= floors in OKLab for normal/protan/deutan/tritan vision
COLORS = ["#0072B2", "#E69F00", "#009E73", "#D55E00", "#56B4E9", "#CC79A7"]
GRID = dict(color="0.88", linewidth=0.7)

LW_VARIANTS = [  # (suffix, label) vs the default noscat 1-angle solve
    ("notlev", "interpolated t_lev"),
    ("3ang", "3-angle quadrature"),
    ("optang", "optimal angles"),
    ("jaco", "Jacobian carried"),
    ("2str", "true two-stream"),
]


def main(path, out="validation_plots.png"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from rte_rrtmgp_tpu.utils.netcdf import NCFile

    nc = NCFile(path)
    var = lambda n: np.asarray(nc.var(n), np.float64)
    up0, dn0 = var("lw_flux_up"), var("lw_flux_dn")
    nlev = up0.shape[1]
    lev = np.arange(nlev)

    fig, axes = plt.subplots(1, 4, figsize=(13, 4.4), sharey=True)
    fig.suptitle("Solver-variant validation (site mean; level 0 = TOA)",
                 fontsize=11)

    # panel 1/2: variant - default flux differences (the reference tool's
    # core plot: where do the variants disagree, and by how much?)
    for ax, base, name in ((axes[0], up0, "up"), (axes[1], dn0, "dn")):
        for i, (suf, label) in enumerate(LW_VARIANTS):
            key = f"lw_flux_{name}_{suf}"
            if not nc.has(key):
                continue
            diff = (var(key) - base).mean(axis=0)
            ax.plot(diff, lev, color=COLORS[i], linewidth=1.8, label=label)
        ax.axvline(0.0, color="0.75", linewidth=0.9)
        ax.set_xlabel(f"LW flux_{name} $-$ default (W m$^{{-2}}$)")
        ax.grid(True, **GRID)
    axes[0].set_ylabel("level index")
    axes[0].invert_yaxis()
    axes[0].legend(fontsize=7.5, frameon=False, loc="lower left")

    # panel 3: the default LW flux profiles themselves
    axes[2].plot(up0.mean(0), lev, color=COLORS[0], linewidth=1.8,
                 label="flux up")
    axes[2].plot(dn0.mean(0), lev, color=COLORS[1], linewidth=1.8,
                 label="flux dn")
    if nc.has("sw_flux_dn"):
        axes[2].plot(var("sw_flux_dn").mean(0), lev, color=COLORS[2],
                     linewidth=1.8, label="SW flux dn")
    axes[2].set_xlabel("flux (W m$^{-2}$)")
    axes[2].grid(True, **GRID)
    axes[2].legend(fontsize=7.5, frameon=False, loc="lower right")

    # panel 4: net-flux divergence profile (heating proxy: d(net)/d(level),
    # the quantity the reference eyeballs as heating-rate sanity)
    net = dn0 - up0
    div = np.diff(net.mean(0))
    axes[3].plot(div, lev[:-1] + 0.5, color=COLORS[0], linewidth=1.8)
    axes[3].axvline(0.0, color="0.75", linewidth=0.9)
    axes[3].set_xlabel("$\\Delta$(net flux) per layer (W m$^{-2}$)")
    axes[3].grid(True, **GRID)

    for ax in axes:
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")
    return out


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit("usage: validation_plots.py VARIANTS.nc [OUT.png]")
    main(sys.argv[1], *(sys.argv[2:3] or ["validation_plots.png"]))
