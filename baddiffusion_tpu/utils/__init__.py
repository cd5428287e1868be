from baddiffusion_tpu.utils.logging import Log, MemoryLog
from baddiffusion_tpu.utils.image import normalize, make_grid, save_image_grid, path_gen
from baddiffusion_tpu.utils.samples import Samples
from baddiffusion_tpu.utils.trackers import Tracker

__all__ = ["Log", "MemoryLog", "normalize", "make_grid", "save_image_grid", "path_gen", "Samples", "Tracker"]
