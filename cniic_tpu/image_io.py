"""Image IO: PNG <-> uint8[H, W, 3].

The reference uses the `image` crate's DynamicImage and drops alpha via
`.to_rgb()` everywhere (e.g. hufc.rs:15); we load through PIL and convert to
RGB at the door.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def load_image(path) -> np.ndarray:
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def save_png(img: np.ndarray, path) -> None:
    Image.fromarray(img, mode="RGB").save(path, format="PNG")
