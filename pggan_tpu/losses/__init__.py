from pggan_tpu.losses.gan import (  # noqa: F401
    attr_loss,
    bce_with_logits,
    drift_loss,
    generator_loss,
    gradient_penalty,
    hinge_loss,
    id_loss,
    l1_loss,
    l1_loss_with_same_person,
    l2_loss,
    l2_loss_with_same_person,
    r1_penalty,
    softplus_loss,
)
from pggan_tpu.losses.collector import LossCollector  # noqa: F401
