from .heating_rates import compute_heating_rate
from .zenith_angle import zenith_angle_with_height, EARTH_RADIUS
from .cloud_sampling import (sampled_mask_max_ran, sampled_mask_exp_ran,
                             draw_samples)
from .compute_bc import compute_bc
from .clr_all_sky import clr_all_sky_lw, clr_all_sky_sw
from .solar_variability import SolarVariability
