from pggan_tpu.utils import checkpoint  # noqa: F401
from pggan_tpu.utils.image import save_image, make_grid_image  # noqa: F401
