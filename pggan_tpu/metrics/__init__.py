from pggan_tpu.metrics.fid import (  # noqa: F401
    frechet_distance,
    frechet_distance_device,
    compute_activation_statistics,
    fid_between_sets,
    RandomConvFeatures,
)
