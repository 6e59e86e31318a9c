"""Synthetic k-distribution generator for RRTMGP gas-optics tests.

The real rrtmgp-data archive is not available offline, so tests build a
small, smooth, fully-featured fake k-distribution: 2 bands x 4 g-points,
4 gases, minor gases with every scaling variant (density, self/foreign
continuum style scaling-gas with and without complement), Rayleigh tables
(SW), Planck tables (LW), and solar-source components (SW). Shapes and
conventions match rte_rrtmgp_tpu.models.rrtmgp.kdist.KDist.from_raw.
"""
import numpy as np

NTEMP, NETA, NPRES = 6, 9, 12
NBND, NGPT = 2, 8
GASES = ["h2o", "co2", "o3", "n2o"]


def synthetic_raw(seed=0, sw=False):
    rng = np.random.default_rng(seed)
    ngas = len(GASES)

    temp_ref = np.linspace(160.0, 355.0, NTEMP)
    press_ref = np.logspace(5, 0, NPRES)      # 1e5 .. 1 Pa, decreasing
    press_ref_trop = 9500.0

    vmr_ref = np.empty((2, ngas + 1, NTEMP))
    vmr_ref[:, 0, :] = 1.0                    # dry air
    base = np.array([8.0e-3, 4.0e-4, 5.0e-6, 3.0e-7])
    for i in range(ngas):
        prof = base[i] * (1.0 + 0.1 * np.sin(np.linspace(0, 2, NTEMP) + i))
        vmr_ref[0, i + 1, :] = prof
        vmr_ref[1, i + 1, :] = prof * 0.7

    # key species: band 1 = (h2o, co2) both atmospheres;
    # band 2 = (o3, dry) lower, (0,0) -> rewritten (2,2) upper
    key_species = np.zeros((2, 2, NBND), np.int64)
    key_species[:, 0, 0] = (1, 2)
    key_species[:, 1, 0] = (1, 2)
    key_species[:, 0, 1] = (3, 0)
    key_species[:, 1, 1] = (0, 0)

    band_lims_gpt = np.array([[1, 4], [5, 8]])
    band_lims_wvn = np.array([[10.0, 1000.0], [1000.0, 3000.0]])

    def smooth_table(shape, scale):
        t = rng.uniform(0.5, 1.5, shape)
        return scale * t

    kmajor = smooth_table((NTEMP, NETA, NPRES + 1, NGPT), 1.0e-21)

    # minor gases, lower: n2o (plain density scaling), h2o self-continuum
    # (scaling gas h2o, no complement), h2o foreign continuum (complement)
    minor_gases_lower = ["n2o", "h2o_slf", "h2o_frg"]
    minor_limits_gpt_lower = np.array([[1, 4], [3, 6], [3, 6]])
    minor_scales_with_density_lower = np.array([True, True, True])
    scaling_gas_lower = ["", "h2o", "h2o"]
    scale_by_complement_lower = np.array([False, False, True])
    kminor_start_lower = np.array([1, 5, 9])
    ncont_lower = 4 + 4 + 4
    kminor_lower = smooth_table((NTEMP, NETA, ncont_lower), 2.0e-23)

    # upper: n2o only, no density scaling
    minor_gases_upper = ["n2o"]
    minor_limits_gpt_upper = np.array([[5, 8]])
    minor_scales_with_density_upper = np.array([False])
    scaling_gas_upper = [""]
    scale_by_complement_upper = np.array([False])
    kminor_start_upper = np.array([1])
    kminor_upper = smooth_table((NTEMP, NETA, 4), 1.0e-23)

    gas_minor = ["n2o", "h2o", "h2o"]
    identifier_minor = ["n2o", "h2o_slf", "h2o_frg"]

    raw = dict(
        gas_names=GASES,
        key_species=key_species,
        band_lims_gpt=band_lims_gpt,
        band_lims_wvn=band_lims_wvn,
        press_ref=press_ref,
        press_ref_trop=press_ref_trop,
        temp_ref=temp_ref,
        vmr_ref=vmr_ref,
        kmajor=kmajor,
        kminor_lower=kminor_lower,
        kminor_upper=kminor_upper,
        gas_minor=gas_minor,
        identifier_minor=identifier_minor,
        minor_gases_lower=minor_gases_lower,
        minor_gases_upper=minor_gases_upper,
        minor_limits_gpt_lower=minor_limits_gpt_lower,
        minor_limits_gpt_upper=minor_limits_gpt_upper,
        minor_scales_with_density_lower=minor_scales_with_density_lower,
        minor_scales_with_density_upper=minor_scales_with_density_upper,
        scaling_gas_lower=scaling_gas_lower,
        scaling_gas_upper=scaling_gas_upper,
        scale_by_complement_lower=scale_by_complement_lower,
        scale_by_complement_upper=scale_by_complement_upper,
        kminor_start_lower=kminor_start_lower,
        kminor_start_upper=kminor_start_upper,
    )

    if sw:
        raw.update(
            rayl_lower=smooth_table((NTEMP, NETA, NGPT), 5.0e-25),
            rayl_upper=smooth_table((NTEMP, NETA, NGPT), 5.0e-25),
            solar_quiet=np.linspace(100.0, 150.0, NGPT),
            solar_facular=np.linspace(1.0, 2.0, NGPT),
            solar_sunspot=np.linspace(0.5, 1.0, NGPT),
            tsi_default=1361.0,
            mg_default=0.1567652,
            sb_default=902.71260,
        )
    else:
        nplnk = 30
        totplnk = np.empty((nplnk, NBND))
        tgrid = np.linspace(temp_ref[0], temp_ref[-1], nplnk)
        totplnk[:, 0] = 0.4 * 5.67e-8 * tgrid ** 4
        totplnk[:, 1] = 0.6 * 5.67e-8 * tgrid ** 4
        pfrac = rng.uniform(0.5, 1.5, (NTEMP, NETA, NPRES + 1, NGPT))
        # normalize so each band's g-points sum to 1
        for b, (g0, g1) in enumerate([(0, 4), (4, 8)]):
            s = pfrac[..., g0:g1].sum(-1, keepdims=True)
            pfrac[..., g0:g1] /= s
        raw.update(
            totplnk=totplnk,
            planck_frac=pfrac,
            optimal_angle_fit=np.array([[-0.5, -0.4], [1.7, 1.75]]),
        )
    return raw


def sample_atmosphere(ncol=3, nlay=7, seed=1, top_at_1=True):
    """Random but physically-ordered atmosphere within the table ranges."""
    rng = np.random.default_rng(seed)
    plev = np.empty((ncol, nlay + 1))
    for c in range(ncol):
        # log-spaced from ~2 Pa to ~1e5 Pa (within press_ref range), top first
        plev[c] = np.logspace(np.log10(3.0), np.log10(0.98e5), nlay + 1)
        plev[c] *= rng.uniform(0.9, 1.1)
    play = 0.5 * (plev[:, :-1] + plev[:, 1:])
    tlay = rng.uniform(180.0, 320.0, (ncol, nlay))
    tlev = np.concatenate([tlay[:, :1], 0.5 * (tlay[:, 1:] + tlay[:, :-1]),
                           tlay[:, -1:]], axis=1)
    tsfc = rng.uniform(260.0, 320.0, ncol)
    vmr = {
        "h2o": rng.uniform(1e-6, 1e-2, (ncol, nlay)),
        "co2": 4.0e-4,
        "o3": rng.uniform(1e-8, 1e-5, (ncol, nlay)),
        "n2o": 3.2e-7,
    }
    if not top_at_1:
        play = play[:, ::-1]
        plev = plev[:, ::-1]
        tlay = tlay[:, ::-1]
        tlev = tlev[:, ::-1]
        vmr = {k: (v[:, ::-1] if isinstance(v, np.ndarray) else v)
               for k, v in vmr.items()}
    return play, plev, tlay, tlev, tsfc, vmr
