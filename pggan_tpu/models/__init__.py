from pggan_tpu.models.generator import (  # noqa: F401
    init_generator_params,
    grow_generator_params,
    generator_apply,
)
from pggan_tpu.models.discriminator import (  # noqa: F401
    init_discriminator_params,
    grow_discriminator_params,
    discriminator_apply,
)
