"""Mean-solar-cycle variability indices.

Equivalent of reference rte/extensions/solar_variability/
mo_solar_variability.F90:20-185 (``ty_solar_var``): interpolate the
Coddington NRLSSI2 facular ("Bremen") and sunspot ("SPOT67") indices,
averaged over solar cycles 13-24, to a requested solar-cycle fraction.
The table ships with the package (extracted from the reference's in-tree
netCDF rrtmgp-solar-var-tables.nc).
"""
from __future__ import annotations

import os

import numpy as np

__all__ = ["SolarVariability"]

_DATA = os.path.join(os.path.dirname(__file__), "data", "solar_var_tables.npz")


class SolarVariability:
    def __init__(self, avgcyc_ind=None):
        """avgcyc_ind: (2, nsolarfrac) [mg; sb] table; defaults to the
        packaged mean-cycle table."""
        if avgcyc_ind is None:
            avgcyc_ind = np.load(_DATA)["solar_var_avgcyc"].T  # file: (nfrac, 2)
        self.avgcyc_ind = np.asarray(avgcyc_ind, np.float64)
        if self.avgcyc_ind.shape[0] != 2:
            raise ValueError("SolarVariability: table must be (2, nsolarfrac)")

    def indices(self, solcycfrac: float):
        """(mg_index, sb_index) at solar-cycle fraction in [0, 1]
        (reference solar_var_ind_interp :97-185). End points are the cycle
        start/end days; interior knots are month centers of the mean
        11-year cycle."""
        if not (0.0 <= solcycfrac <= 1.0):
            raise ValueError("solar_var_ind_interp: solcycfrac out of range")
        tbl = self.avgcyc_ind
        nsolfrac = tbl.shape[1]
        if solcycfrac == 0.0:
            return float(tbl[0, 0]), float(tbl[1, 0])
        if solcycfrac == 1.0:
            return float(tbl[0, -1]), float(tbl[1, -1])
        intrvl_len = 1.0 / (nsolfrac - 2)
        half = 0.5 * intrvl_len
        if solcycfrac <= half:
            sfid, fraclo, frachi = 0, 0.0, half
        elif solcycfrac < 1.0 - half:
            sfid = int(np.floor((solcycfrac - half) * (nsolfrac - 2))) + 1
            fraclo = (sfid - 1) * intrvl_len + half
            frachi = fraclo + intrvl_len
        else:
            sfid, fraclo, frachi = nsolfrac - 2, 1.0 - half, 1.0
        f = (solcycfrac - fraclo) / (frachi - fraclo)
        mg = tbl[0, sfid] + f * (tbl[0, sfid + 1] - tbl[0, sfid])
        sb = tbl[1, sfid] + f * (tbl[1, sfid + 1] - tbl[1, sfid])
        return float(mg), float(sb)
