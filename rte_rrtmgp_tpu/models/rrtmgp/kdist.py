"""The k-distribution container and its load-time transforms.

TPU-first equivalent of the reference ``ty_gas_optics_rrtmgp`` *state* and
its ``load_int/load_ext -> init_abs_coeffs`` pipeline
(rrtmgp/frontend/mo_gas_optics_rrtmgp.F90:938-1381):

  * gas filtering against the host model's available gases (:1222-1249)
  * minor-array reduction (``reduce_minor_arrays``, :1790-1907)
  * minor index construction (``create_idx_minor*``, :1637-1677)
  * flavor list + g-point flavor map (``create_flavor`` :1598-1632,
    ``create_gpoint_flavor`` :1930-1946)
  * derived interpolation constants (:1356-1365)
  * NRLSSI2 solar-variability state (:1118-1144, :760-835)

All of this runs once, in NumPy, at load time. The result is a frozen
pytree: small static metadata (numpy arrays, hashable tuples) plus the
large lookup tables as device arrays that JAX replicates into HBM on every
chip. Tables are stored temperature-major: kmajor/planck_frac
(ntemp, neta, npres+1, ngpt); kminor (ntemp, neta, ncontrib);
krayl (ntemp, neta, ngpt, 2).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...spectral import SpectralGrid
from ...ops.pallas.major_gather import PSPAN as _PSPAN

__all__ = ["KDist", "MinorSet"]

# NRLSSI2 offsets (reference mo_gas_optics_rrtmgp.F90:776-777)
_A_OFFSET = 0.1495954
_B_OFFSET = 0.00066696


@dataclasses.dataclass(frozen=True)
class MinorSet:
    """Static per-atmosphere minor-gas metadata (post-reduction).
    All indices 0-based; ``idx_minor``/``idx_minor_scaling`` index the
    col_gas array (0 = dry air), -1 = no scaling gas."""
    gas_names: tuple                 # identifier of each minor contributor
    limits_gpt: tuple                # ((g0, g1), ...) 0-based inclusive
    scales_with_density: tuple       # bool per minor
    scale_by_complement: tuple       # bool per minor
    idx_minor: tuple                 # int per minor
    idx_minor_scaling: tuple         # int per minor
    kminor_start: tuple              # int per minor, 0-based into kminor
    flavor: tuple = ()               # 0-based flavor of each minor's window
                                     # (= gpoint_flavor[atm, g0]); lets the
                                     # tau kernel share one gather among all
                                     # minors with equal eta interpolant

    def __len__(self):
        return len(self.gas_names)


def _lower(s):
    return str(s).strip().lower()


@dataclasses.dataclass(frozen=True)
class KDist:
    # --- static metadata ---
    grid: SpectralGrid
    gas_names: tuple                 # reduced, lower-case
    flavor: np.ndarray               # (2, nflav) int, indexes col_gas (0=dry)
    gpoint_flavor: np.ndarray        # (2, ngpt) int 0-based flavor
    press_ref_log: np.ndarray        # (npres) float64
    temp_ref: np.ndarray             # (ntemp) float64
    press_ref_trop_log: float
    press_ref_log_delta: float
    temp_ref_min: float
    temp_ref_delta: float
    press_ref_min: float
    press_ref_max: float
    temp_ref_max: float
    vmr_ref: np.ndarray              # (2, ngas+1, ntemp), 0 = dry air
    minor_lower: MinorSet
    minor_upper: MinorSet
    neta: int
    # --- device tables ---
    kmajor: jax.Array                # (ntemp, neta, npres+1, ngpt)
    kminor_lower: jax.Array          # (ntemp, neta, ncont_lower)
    kminor_upper: jax.Array
    krayl: Optional[jax.Array]       # (ntemp, neta, ngpt, 2) or None
    # LW-only
    planck_frac: Optional[jax.Array]  # (ntemp, neta, npres+1, ngpt)
    totplnk: Optional[jax.Array]      # (nPlanckTemp, nbnd)
    totplnk_delta: float
    optimal_angle_fit: Optional[np.ndarray]  # (2, nbnd) static
    # SW-only
    solar_source_quiet: Optional[jax.Array]
    solar_source_facular: Optional[jax.Array]
    solar_source_sunspot: Optional[jax.Array]
    solar_source: Optional[jax.Array]        # (ngpt,)
    # --- corner-expanded gather tables (TPU optimization; see
    # ops/gas_optics.py module docstring). Derived from the above at load
    # time; one gather row covers all (press, eta) interpolation corners so
    # the hot kernels issue 4-8x fewer gather descriptors (TPU gathers are
    # row-descriptor-bound, ~3-5 ns/row regardless of row width).
    kmajor_x: Optional[jax.Array] = None
    # (ntemp, neta-1, npres, 4, ntab, ngpt); corner axis = (dp, de);
    # ntab=2 packs planck_frac behind kmajor for LW so tau + Planck
    # fraction share one gather.
    kminor_lower_x: Optional[jax.Array] = None  # (ntemp, neta-1, 2, ncont)
    kminor_upper_x: Optional[jax.Array] = None  # corner axis = de
    krayl_x: Optional[jax.Array] = None  # (ntemp, neta-1, 2, 2, ngpt):
                                         # [jt, je, itropo, de, g]
    # lane-gather tables (Pallas kernels, ops/pallas/minor_gather.py):
    # the (jtemp, jeta) row domain ntemp*(neta-1) goes on the 128-lane
    # axis, payload on sublanes
    kminor_lower_lane: Optional[jax.Array] = None  # (2*ncont, 128)
    kminor_upper_lane: Optional[jax.Array] = None
    krayl_lane: Optional[jax.Array] = None         # (2*2*ngpt, 128)
    lane_rows: int = 0                             # = ntemp*(neta-1)
    # major-interpolation lane table (ops/pallas/major_gather.py):
    # per-band payload (pressure window, table in {kmajor, planck_frac},
    # gpt) on sublanes, (jtemp, jeta) domain on lanes; pressure axis
    # edge-padded by PSPAN-2 rows for the block-window dynamic slice.
    kmajor_lane: Optional[jax.Array] = None  # (nbnd, P*ntab*w, 128)
    kmajor_lane_ntab: int = 1

    # ------------------------------------------------------------------
    @property
    def ngas(self) -> int:
        return len(self.gas_names)

    @property
    def ngpt(self) -> int:
        return self.grid.ngpt

    @property
    def nflav(self) -> int:
        return self.flavor.shape[1]

    def source_is_internal(self) -> bool:
        return self.totplnk is not None

    def source_is_external(self) -> bool:
        return self.solar_source is not None

    def idx_gas(self, name: str) -> int:
        """1-based index into col_gas (0 = dry air); -1 if absent."""
        key = _lower(name)
        return self.gas_names.index(key) + 1 if key in self.gas_names else -1

    # ------------------------------------------------------------------
    # solar variability (reference set_solar_variability :760-798, set_tsi)
    def with_solar_variability(self, mg_index: float, sb_index: float,
                               tsi: Optional[float] = None) -> "KDist":
        if mg_index < 0 or sb_index < 0:
            raise ValueError("mg_index/sb_index out of range")
        src = (self.solar_source_quiet
               + (mg_index - _A_OFFSET) * self.solar_source_facular
               + (sb_index - _B_OFFSET) * self.solar_source_sunspot)
        out = dataclasses.replace(self, solar_source=src)
        if tsi is not None:
            out = out.with_tsi(tsi)
        return out

    def with_tsi(self, tsi: float) -> "KDist":
        if tsi < 0:
            raise ValueError("tsi out of range")
        norm = 1.0 / jnp.sum(self.solar_source)
        return dataclasses.replace(self, solar_source=self.solar_source * (tsi * norm))

    # ------------------------------------------------------------------
    @staticmethod
    def from_raw(available_gases,
                 gas_names, key_species, band_lims_gpt, band_lims_wvn,
                 press_ref, press_ref_trop, temp_ref,
                 vmr_ref,
                 kmajor, kminor_lower, kminor_upper,
                 gas_minor, identifier_minor,
                 minor_gases_lower, minor_gases_upper,
                 minor_limits_gpt_lower, minor_limits_gpt_upper,
                 minor_scales_with_density_lower, minor_scales_with_density_upper,
                 scaling_gas_lower, scaling_gas_upper,
                 scale_by_complement_lower, scale_by_complement_upper,
                 kminor_start_lower, kminor_start_upper,
                 rayl_lower=None, rayl_upper=None,
                 totplnk=None, planck_frac=None, optimal_angle_fit=None,
                 solar_quiet=None, solar_facular=None, solar_sunspot=None,
                 tsi_default=None, mg_default=None, sb_default=None,
                 dtype=jnp.float32) -> "KDist":
        """Build a KDist from raw k-distribution arrays.

        Array conventions (all numpy, already in interpolation-friendly
        layout; the netCDF loader handles file-order transposes):
          kmajor/planck_frac: (ntemp, neta, npres+1, ngpt)
          kminor_*: (ntemp, neta, ncontributors)
          rayl_*: (ntemp, neta, ngpt)
          vmr_ref: (2, ngas_file+1, ntemp) with dry air at index 0
          key_species: (2, 2, nbnd) 1-based gas indices (0 = none)
          band_lims_gpt: (nbnd, 2) 1-based inclusive
          minor_limits_gpt_*: (nminor, 2) 1-based inclusive
          kminor_start_*: (nminor,) 1-based
          totplnk: (nPlanckTemp, nbnd); optimal_angle_fit: (2, nbnd)
          solar_*: (ngpt,)
        """
        if isinstance(available_gases, (list, tuple, set)):
            avail = {_lower(g) for g in available_gases}
        else:  # GasConcs
            avail = set(available_gases.gas_names)
        gas_names = [_lower(g) for g in gas_names]
        gas_minor = [_lower(g) for g in gas_minor]
        identifier_minor = [_lower(g) for g in identifier_minor]

        # ---- gas filtering (reference :1222-1249) ----
        present = [g in avail for g in gas_names]
        red = [g for g, p in zip(gas_names, present) if p]
        ngas = len(red)
        vmr_ref = np.asarray(vmr_ref, np.float64)
        vmr_red = np.empty((2, ngas + 1, vmr_ref.shape[2]))
        vmr_red[:, 0, :] = vmr_ref[:, 0, :]     # dry air
        for i, g in enumerate(red):
            vmr_red[:, i + 1, :] = vmr_ref[:, gas_names.index(g) + 1, :]

        # ---- key species remap + flavors (reference :1346-1353) ----
        key_species = np.asarray(key_species, np.int64)  # (2,2,nbnd)
        ks_red = np.zeros_like(key_species)
        missing = []
        for ip in range(2):
            for ia in range(2):
                for ib in range(key_species.shape[2]):
                    k = key_species[ip, ia, ib]
                    if k != 0:
                        name = gas_names[k - 1]
                        if name in red:
                            ks_red[ip, ia, ib] = red.index(name) + 1
                        else:
                            missing.append(name)
                            ks_red[ip, ia, ib] = -1
        if missing:
            raise ValueError(
                f"gas_optics: required gases {sorted(set(missing))} are not provided")

        def rewrite(pair):
            return (2, 2) if tuple(pair) == (0, 0) else tuple(pair)

        nbnd = key_species.shape[2]
        flavor_list = []
        for ib in range(nbnd):
            for ia in range(2):
                pair = rewrite(ks_red[:, ia, ib])
                if pair not in flavor_list:
                    flavor_list.append(pair)
        flavor = np.asarray(flavor_list, np.int64).T         # (2, nflav)

        grid = SpectralGrid.from_arrays(band_lims_wvn, band_lims_gpt)
        gpt2band = grid.gpt2band                             # 0-based
        ngpt = grid.ngpt
        # the band-major table transforms below (and the lane/fused
        # kernels) build the g-point axis by concatenating per-band
        # slices in row order — bands must tile [1, ngpt] contiguously
        # ascending, as every published k-distribution does; reject
        # anything else up front rather than mis-indexing silently
        blg = np.asarray(band_lims_gpt, np.int64)
        expect_start = 1
        for b in range(blg.shape[0]):
            if blg[b, 0] != expect_start or blg[b, 1] < blg[b, 0]:
                raise ValueError(
                    "from_raw: band_lims_gpt must be contiguous ascending "
                    f"from g-point 1; band {b} spans {blg[b].tolist()} "
                    f"(expected to start at {expect_start})")
            expect_start = int(blg[b, 1]) + 1
        if expect_start != ngpt + 1:
            raise ValueError("from_raw: band_lims_gpt does not cover "
                             f"[1, {ngpt}]")
        gpoint_flavor = np.zeros((2, ngpt), np.int64)
        for igpt in range(ngpt):
            for ia in range(2):
                pair = rewrite(ks_red[:, ia, gpt2band[igpt]])
                gpoint_flavor[ia, igpt] = flavor_list.index(pair)  # 0-based

        # ---- minor reduction (reference reduce_minor_arrays :1790-1907) ----
        def reduce_minor(kminor, names, limits, swd, sgas, sbc, kstart):
            names = [_lower(n) for n in names]
            limits = np.asarray(limits, np.int64).reshape(-1, 2)
            kstart = np.asarray(kstart, np.int64)
            keep, k_slices, new_start, tot = [], [], [], 0
            for i, ident in enumerate(names):
                gas = gas_minor[identifier_minor.index(ident)]
                if gas not in avail:
                    continue
                w = int(limits[i, 1] - limits[i, 0] + 1)
                keep.append(i)
                s0 = int(kstart[i] - 1)
                k_slices.append(np.asarray(kminor)[:, :, s0:s0 + w])
                new_start.append(tot)
                tot += w
            if keep:
                k_red = np.concatenate(k_slices, axis=-1)
            else:
                k_red = np.zeros(np.asarray(kminor).shape[:2] + (0,))
            idx_minor = []
            idx_scaling = []
            for i in keep:
                gas = gas_minor[identifier_minor.index(names[i])]
                idx_minor.append(red.index(gas) + 1)
                sg = _lower(sgas[i])
                idx_scaling.append(red.index(sg) + 1 if sg in red else -1)
            mset = MinorSet(
                gas_names=tuple(names[i] for i in keep),
                limits_gpt=tuple((int(limits[i, 0] - 1), int(limits[i, 1] - 1))
                                 for i in keep),
                scales_with_density=tuple(bool(swd[i]) for i in keep),
                scale_by_complement=tuple(bool(sbc[i]) for i in keep),
                idx_minor=tuple(idx_minor),
                idx_minor_scaling=tuple(idx_scaling),
                kminor_start=tuple(new_start),
            )
            return mset, k_red

        def corner_expand_eta(tab):
            """(ntemp, neta, ...) -> (ntemp, neta-1, 2, ...): one row per
            base eta index carrying both eta corners (je, je+1)."""
            tab = np.asarray(tab, np.float64)
            neta_t = tab.shape[1]
            return np.stack([tab[:, de:neta_t - 1 + de] for de in (0, 1)],
                            axis=2)

        ntemp_k = np.asarray(kmajor).shape[0]
        netam1_k = np.asarray(kmajor).shape[1] - 1
        lane_rows = ntemp_k * netam1_k

        def lane_pad(t2):
            """(payload, rows) -> (payload, 128) lane table."""
            if lane_rows > 128:
                return None
            pad = 128 - t2.shape[1]
            return jnp.asarray(np.pad(t2, ((0, 0), (0, pad))), dtype)

        def kminor_lane_of(kx_np):
            # (ntemp, netam1, de, ncont) -> rows [de*ncont + c], lanes
            # [jt*netam1 + je]
            t = np.transpose(kx_np, (2, 3, 0, 1))
            return lane_pad(t.reshape(t.shape[0] * t.shape[1], lane_rows))

        def major_lane_of(tabs_np, blims, pspan):
            """Per-band lane table for the 3-D major interpolation:
            payload (press-window, table, gpt) rows, (jt, je) lanes."""
            ntemp_m, neta_m, npresp1_m, _ = tabs_np[0].shape
            rows_m = ntemp_m * neta_m
            if rows_m > 127:          # te+1 (eta corner) must stay in lane
                return None
            widths = blims[:, 1] - blims[:, 0] + 1
            if len(set(int(x) for x in widths)) != 1:
                return None
            w_m = int(widths[0])
            ntab_m = len(tabs_np)
            P = npresp1_m + pspan - 2
            arr = np.stack(
                [np.concatenate(
                    [t, np.repeat(t[:, :, -1:, :], pspan - 2, axis=2)],
                    axis=2) for t in tabs_np], axis=3)
            # (ntemp, neta, P, ntab, ngpt)
            out = np.zeros((blims.shape[0], P * ntab_m * w_m, 128))
            for b in range(blims.shape[0]):
                g0, g1 = int(blims[b, 0]) - 1, int(blims[b, 1]) - 1
                sl = arr[:, :, :, :, g0:g1 + 1]
                sl = np.transpose(sl, (2, 3, 4, 0, 1)).reshape(
                    P * ntab_m * w_m, rows_m)
                out[b, :, :rows_m] = sl
            return jnp.asarray(out, dtype)

        mlow, klow = reduce_minor(kminor_lower, minor_gases_lower,
                                  minor_limits_gpt_lower,
                                  minor_scales_with_density_lower,
                                  scaling_gas_lower, scale_by_complement_lower,
                                  kminor_start_lower)
        mupp, kupp = reduce_minor(kminor_upper, minor_gases_upper,
                                  minor_limits_gpt_upper,
                                  minor_scales_with_density_upper,
                                  scaling_gas_upper, scale_by_complement_upper,
                                  kminor_start_upper)

        # ---- derived interpolation constants (reference :1356-1365) ----
        press_ref = np.asarray(press_ref, np.float64)
        temp_ref = np.asarray(temp_ref, np.float64)
        press_ref_log = np.log(press_ref)
        npres = press_ref.shape[0]
        ntemp = temp_ref.shape[0]
        press_ref_min = float(press_ref[-1])
        press_ref_max = float(press_ref[0])
        press_ref_log_delta = (np.log(press_ref_min) - np.log(press_ref_max)) / (npres - 1)
        temp_ref_min = float(temp_ref[0])
        temp_ref_max = float(temp_ref[-1])
        temp_ref_delta = (temp_ref_max - temp_ref_min) / (ntemp - 1)

        # flavor of each minor window (for gather sharing in tau_minor)
        mlow = dataclasses.replace(mlow, flavor=tuple(
            int(gpoint_flavor[0, g0]) for (g0, _) in mlow.limits_gpt))
        mupp = dataclasses.replace(mupp, flavor=tuple(
            int(gpoint_flavor[1, g0]) for (g0, _) in mupp.limits_gpt))

        krayl = krayl_x = krayl_lane = None
        if (rayl_lower is None) != (rayl_upper is None):
            # either alone would silently drop Rayleigh scattering
            raise ValueError("rayl_lower and rayl_upper must both be provided")
        if rayl_lower is not None:
            krayl = jnp.asarray(np.stack([rayl_lower, rayl_upper], axis=-1), dtype)
            # [jt, je, itropo, de, g]
            rx = np.stack(
                [corner_expand_eta(rayl_lower), corner_expand_eta(rayl_upper)],
                axis=2)
            krayl_x = jnp.asarray(rx, dtype)
            # rows [(atm*2 + de)*ngpt + g], lanes [jt*netam1 + je]
            rt = np.transpose(rx, (2, 3, 4, 0, 1))
            krayl_lane = lane_pad(rt.reshape(-1, lane_rows))

        # corner-expanded major table: one row per (jt, je, jp) base carries
        # all four (press, eta) corners; LW packs planck_frac alongside so
        # tau + Planck fraction share the same gather rows.
        kmaj_np = np.asarray(kmajor, np.float64)
        tabs = [kmaj_np]
        if planck_frac is not None:
            tabs.append(np.asarray(planck_frac, np.float64))
        major_tabs = tabs
        neta_k, npresp1 = kmaj_np.shape[1], kmaj_np.shape[2]
        corners = []
        for dp in (0, 1):
            for de in (0, 1):
                corners.append(np.stack(
                    [t[:, de:neta_k - 1 + de, dp:npresp1 - 1 + dp, :]
                     for t in tabs], axis=-2))
        kmajor_x = jnp.asarray(np.stack(corners, axis=3), dtype)

        def kminor_x_of(k_red):
            return jnp.asarray(corner_expand_eta(k_red), dtype)

        totplnk_delta = 0.0
        totplnk_j = planck_j = None
        oaf = None
        if totplnk is not None:
            if planck_frac is None:
                raise ValueError("from_raw: totplnk requires planck_frac "
                                 "(an internal-source k-distribution needs "
                                 "both Planck tables)")
            totplnk = np.asarray(totplnk, np.float64)
            totplnk_delta = (temp_ref_max - temp_ref_min) / (totplnk.shape[0] - 1)
            totplnk_j = jnp.asarray(totplnk, dtype)
            planck_j = jnp.asarray(planck_frac, dtype)
            oaf = (np.asarray(optimal_angle_fit, np.float64)
                   if optimal_angle_fit is not None else None)

        sq = sf = ss = src = None
        if solar_quiet is not None:
            sq = jnp.asarray(solar_quiet, dtype)
            sf = jnp.asarray(solar_facular, dtype)
            ss = jnp.asarray(solar_sunspot, dtype)
            src = sq  # placeholder; replaced below via with_solar_variability

        kd = KDist(
            grid=grid, gas_names=tuple(red), flavor=flavor,
            gpoint_flavor=gpoint_flavor,
            press_ref_log=press_ref_log, temp_ref=temp_ref,
            press_ref_trop_log=float(np.log(press_ref_trop)),
            press_ref_log_delta=float(press_ref_log_delta),
            temp_ref_min=temp_ref_min, temp_ref_delta=float(temp_ref_delta),
            press_ref_min=press_ref_min, press_ref_max=press_ref_max,
            temp_ref_max=temp_ref_max,
            vmr_ref=vmr_red, minor_lower=mlow, minor_upper=mupp,
            neta=int(np.asarray(kmajor).shape[1]),
            kmajor=jnp.asarray(kmajor, dtype),
            kminor_lower=jnp.asarray(klow, dtype),
            kminor_upper=jnp.asarray(kupp, dtype),
            krayl=krayl,
            planck_frac=planck_j, totplnk=totplnk_j,
            totplnk_delta=float(totplnk_delta),
            optimal_angle_fit=oaf,
            solar_source_quiet=sq, solar_source_facular=sf,
            solar_source_sunspot=ss, solar_source=src,
            kmajor_x=kmajor_x,
            kminor_lower_x=kminor_x_of(klow),
            kminor_upper_x=kminor_x_of(kupp),
            krayl_x=krayl_x,
            kminor_lower_lane=kminor_lane_of(corner_expand_eta(klow)),
            kminor_upper_lane=kminor_lane_of(corner_expand_eta(kupp)),
            krayl_lane=krayl_lane,
            lane_rows=lane_rows,
            kmajor_lane=major_lane_of(
                major_tabs, np.asarray(band_lims_gpt, np.int64), _PSPAN),
            kmajor_lane_ntab=len(major_tabs),
        )
        if sq is not None:
            kd = kd.with_solar_variability(
                mg_default if mg_default is not None else _A_OFFSET,
                sb_default if sb_default is not None else _B_OFFSET)
            if tsi_default is not None:
                kd = kd.with_tsi(tsi_default)
        return kd


# Note: KDist is deliberately NOT registered as a pytree. Its lookup tables
# are load-time constants; gas-optics functions close over the object so the
# tables are captured once per jit trace (and replicated to every device by
# XLA), and the numpy metadata stays host-side and static.
