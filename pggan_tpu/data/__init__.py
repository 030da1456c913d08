from pggan_tpu.data.dataset import (  # noqa: F401
    ImageFolderDataset,
    SyntheticDataset,
    PairedFaceDataset,
    PairedValidDataset,
    list_image_paths,
    split_dataset,
    build_dataset,
)
from pggan_tpu.data.pipeline import DataPipeline, InfiniteSampler  # noqa: F401
