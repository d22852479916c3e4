from .state import (  # noqa: F401
    TrainConfig,
    TrainState,
    init_train_state,
    make_lr_schedule,
    make_optimizer,
)
from .step import (  # noqa: F401
    make_eval_step,
    make_loss_fn,
    make_probe_fn,
    make_train_step,
    resolve_weight_fn,
)
from .ema import ema_health, ema_init, ema_reinit_from_params, ema_update  # noqa: F401
from .checkpoint import (  # noqa: F401
    apply_resume_overrides,
    find_latest_checkpoint,
    load_checkpoint,
    mirror_checkpoint,
    save_checkpoint,
    wait_for_checkpoints,
)
from .preemption import PreemptionFlag, catch_preemption  # noqa: F401
from .distill import (  # noqa: F401
    distill_ladder,
    make_distill_step,
    onestep_target,
    progressive_distill,
    student_timesteps,
    student_x0,
)
from .consistency import (  # noqa: F401
    consistency_distill,
    consistency_fn,
    consistency_ladder,
    consistency_sample_loop,
    consistency_scalings,
    make_consistency_step,
)
from .loop import evaluate_loss, train_ddpm, train_one_epoch  # noqa: F401
from .vae import (  # noqa: F401
    load_vae,
    make_vae_train_step,
    train_vae,
    vae_decode_fn,
    vae_encode_fn,
)
from .diagnostics import StepTimer, device_mem_mb, fmt_hms, profiler_trace  # noqa: F401
