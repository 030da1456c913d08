from pggan_tpu.native.build import get_loader_lib, native_available  # noqa: F401
from pggan_tpu.native.loader import NativeImageLoader  # noqa: F401
