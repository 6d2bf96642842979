from ich_tpu.ops import (
    ct,
    distance,
    losses,
    masks,
    metrics,
    morphology,
    sliding_window,
    transforms,
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
    "warp",
]
