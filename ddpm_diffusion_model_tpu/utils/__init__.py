from .images import load_image, make_grid, save_image, save_image_grid  # noqa: F401
from .config import ExperimentConfig, PRESETS, get_preset  # noqa: F401
from .debugging import (  # noqa: F401
    assert_tree_finite,
    enable_nan_debugging,
    nan_debugging,
    tree_all_finite,
)
from .summary import model_summary, param_table  # noqa: F401
from .flops import mfu, sampling_flops, train_step_flops, unet_fwd_flops  # noqa: F401
from .fid import extract_features, frechet_distance, rfid  # noqa: F401
