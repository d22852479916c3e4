from .timesteps import build_ddim_schedule, ddpm_timesteps  # noqa: F401
from .loops import ddim_sample_loop, ddpm_sample_loop, to_unit_interval  # noqa: F401
from .inference import (  # noqa: F401
    cfg_eps_fn,
    ddim_infer_sample,
    ddim_sample,
    ddpm_infer_sample,
    ddpm_sample,
    dpmpp_infer_sample,
    render_denoise_strip,
    render_denoise_strip_ddim,
)
from .solvers import (  # noqa: F401
    dpmpp2m_coefficients,
    dpmpp2m_sample_loop,
    dpmpp2m_sde_coefficients,
    dpmpp2m_sde_sample_loop,
)
from .editing import (  # noqa: F401
    box_mask,
    img2img_infer_sample,
    img2img_sample_loop,
    inpaint_infer_sample,
    inpaint_sample_loop,
    truncate_ladder,
)
from .fast import ddim_sample_fast, ddim_sample_loop_cached  # noqa: F401
from .superres import cascade_infer_sample, upsample_infer_sample  # noqa: F401
from .latent import (  # noqa: F401
    check_latent_config,
    encode_corpus,
    latent_sample,
    make_latent_sample_fn,
)
from .distributed import sample_grid_sharded  # noqa: F401
