from ich_tpu.data.core import SliceDataset2D, VolumeDataset3D, batch_indices
from ich_tpu.data.synthetic import synthetic_ich_slices, synthetic_ich_volume

__all__ = [
    "SliceDataset2D",
    "VolumeDataset3D",
    "batch_indices",
    "synthetic_ich_slices",
    "synthetic_ich_volume",
]
