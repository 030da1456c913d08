from pggan_tpu.losses.gan import (  # noqa: F401
    bce_with_logits,
    softplus_loss,
    hinge_loss,
    r1_penalty,
    gradient_penalty,
    drift_loss,
    generator_loss,
)
from pggan_tpu.losses.collector import LossCollector  # noqa: F401
