"""Data layer: host-side datasets, canvas batching, device feed."""

from .datasets import (AreaConstraintDataset, CompoundDataset,  # noqa: F401
                       Digest2019PointDataset, PointSupervisionDataset,
                       SegmentationDataset, WESUPV2Dataset)
from .loader import CanvasBatcher, CanvasSpec  # noqa: F401
