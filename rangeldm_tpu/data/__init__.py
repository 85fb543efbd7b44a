from rangeldm_tpu.data.datasets import (  # noqa: F401
    DatasetConfig, RangeImageDataset, RangeLoader, collate,
)
