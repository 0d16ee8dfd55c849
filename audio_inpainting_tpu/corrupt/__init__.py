from .masks import (
    random_dropout_mask,
    contiguous_gap_mask,
    center_gap_bounds,
    random_frame_mask,
    frame_gap_mask_2d,
    training_stripes,
)
from .detect import (
    silence_mask,
    find_main_gap,
    find_gaps,
    silent_frame_columns,
    mask_to_bad_columns,
)

__all__ = [
    "random_dropout_mask",
    "contiguous_gap_mask",
    "center_gap_bounds",
    "random_frame_mask",
    "frame_gap_mask_2d",
    "training_stripes",
    "silence_mask",
    "find_main_gap",
    "find_gaps",
    "silent_frame_columns",
    "mask_to_bad_columns",
]
