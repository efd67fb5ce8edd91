from sd_tpu.data.datasets import (
    CocoCaptionDataset,
    ImageFolderDataset,
    ImagePathsDataset,
    LSUNDataset,
)
from sd_tpu.data.loader import DataLoader, parallel_data_prefetch
