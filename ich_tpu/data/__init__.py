from ich_tpu.data.core import (
    LabeledSliceDataset,
    SliceDataset2D,
    VolumeDataset3D,
    batch_indices,
)
from ich_tpu.data.synthetic import (
    synthetic_ich_slices,
    synthetic_ich_volume,
    synthetic_rsna_slices,
    write_segich_tree,
)

__all__ = [
    "SliceDataset2D",
    "LabeledSliceDataset",
    "VolumeDataset3D",
    "batch_indices",
    "synthetic_ich_slices",
    "synthetic_ich_volume",
    "synthetic_rsna_slices",
    "write_segich_tree",
]
