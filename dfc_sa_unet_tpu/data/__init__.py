from dfc_sa_unet_tpu.data.dataset import SegmentationDataset
from dfc_sa_unet_tpu.data.loader import DataLoaderFactory, normalize_on_device

__all__ = ["SegmentationDataset", "DataLoaderFactory", "normalize_on_device"]
