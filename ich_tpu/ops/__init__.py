from ich_tpu.ops import (
    ct,
    distance,
    losses,
    masks,
    metrics,
    morphology,
    sliding_window,
    transforms,
    transforms3d,  # registers Flip3D/RotateInPlane/AffineAugment3D
    warp,
)

__all__ = [
    "ct",
    "distance",
    "losses",
    "masks",
    "metrics",
    "morphology",
    "sliding_window",
    "transforms",
    "transforms3d",
    "warp",
]
