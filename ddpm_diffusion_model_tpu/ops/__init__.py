from .schedules import (  # noqa: F401
    DiffusionConfig,
    DiffusionSchedule,
    beta_schedule_cosine,
    beta_schedule_linear,
    beta_schedule_rf,
    extract,
    make_schedule,
)
from .dropout import PackedDropout, packed_dropout  # noqa: F401
from .superres import aug_cond, build_cond, degrade, upsample_cond  # noqa: F401
from .likelihood import (  # noqa: F401
    discretized_gaussian_log_likelihood,
    gaussian_kl,
    prior_kl,
    vlb_bits_per_dim,
    vlb_bits_per_dim_mc,
    vlb_term,
)
from .diffusion import (  # noqa: F401
    ddim_step,
    loss_simple,
    p_sample_step,
    posterior_mean_variance,
    predict_x0,
    q_sample,
    sample_timesteps,
)
