from .images import make_grid, save_image, save_image_grid  # noqa: F401
