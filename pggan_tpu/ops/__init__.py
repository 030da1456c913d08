"""Core tensor ops for pggan_tpu.

Every op ships a pure-`jnp` reference implementation (`impl='xla'`) that XLA
fuses aggressively, plus — for the hot elementwise/normalization paths — a
hand-written Pallas TPU kernel (`impl='pallas'`), mirroring the reference's
`impl='cuda'|'ref'` dual-path pattern
(/root/reference/submodel/stylegan2/torch_utils/ops/bias_act.py:83-86).
"""

from pggan_tpu.ops.basic import (  # noqa: F401
    pixel_norm,
    upscale2d,
    downscale2d,
    minibatch_stddev,
    leaky_relu,
    bias_act,
    blend,
)
from pggan_tpu.ops.equalized import (  # noqa: F401
    equalized_conv2d,
    equalized_linear,
    init_conv_params,
    init_linear_params,
    he_constant,
)
from pggan_tpu.ops.resample import (  # noqa: F401
    upfirdn2d,
    setup_filter,
    filter2d,
    upsample2d,
    downsample2d,
)
from pggan_tpu.ops.composite import (  # noqa: F401
    filtered_lrelu,
    conv2d_resample,
    grid_sample,
)
from pggan_tpu.ops.fused_scale import upscale_conv3x3, depth_to_space2  # noqa: F401
