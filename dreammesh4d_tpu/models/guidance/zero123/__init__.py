from .guidance import (
    StableZero123Guidance,
    TemporalStableZero123Guidance,
    Zero123Config,
    Zero123Modules,
    camera_delta_T,
)
from .scheduler import DiffusionSchedule, add_noise, ddim_step, make_schedule
from .unet import UNetModel
from .vae import AutoencoderKL
