from baddiffusion_tpu.utils.logging import Log, MemoryLog
from baddiffusion_tpu.utils.image import normalize, make_grid, save_image_grid, path_gen

__all__ = ["Log", "MemoryLog", "normalize", "make_grid", "save_image_grid", "path_gen"]
