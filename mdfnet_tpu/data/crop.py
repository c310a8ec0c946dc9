"""Image/intrinsics cropping utilities.

The fusibile pipeline needs /32-divisible images (reference
tools/gipuma/main.py:102-117 + tool.py:157-169 cal_ncutpixs); the eval
loaders crop heights to make all four pyramid scales divide (reference
load/dtueval.py:34, load/tankseval.py:36). These helpers centralise that
math: symmetric crops with the matching principal-point shift.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def divisible_crop_amounts(size: int, multiple: int = 32) -> Tuple[int, int]:
    """(front, back) pixels to cut so size divides ``multiple`` — the back
    gets the extra pixel on odd cuts, like the reference's cal_ncutpixs."""
    cut = size % multiple
    return cut // 2, cut - cut // 2

def crop_image_and_intrinsics(img: np.ndarray, intrinsic: np.ndarray,
                              multiple: int = 32
                              ) -> Tuple[np.ndarray, np.ndarray]:
    """Center-crop HWC image to /multiple-divisible dims and shift the
    principal point accordingly."""
    h, w = img.shape[:2]
    top, bottom = divisible_crop_amounts(h, multiple)
    left, right = divisible_crop_amounts(w, multiple)
    out = img[top:h - bottom, left:w - right]
    k = np.array(intrinsic, np.float32).copy()
    k[0, 2] -= left
    k[1, 2] -= top
    return out, k
