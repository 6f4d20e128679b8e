"""Film: radiance accumulation buffers and montage grids.

Reference parity: film_t (ky.cpp:1531-1791) and film_grid_t
(ky.cpp:1802-1836). The film is a plain (H, W, 3) float32 array — a pytree
leaf, so partial renders checkpoint/restore as data and sharded renders can
psum/all_gather their tiles.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


def gamma_encode(x):
    """Linear [0,1] -> sRGB-ish u8 via pow(1/2.2)*255+0.5 (ky.cpp:1548)."""
    x = np.clip(np.asarray(x, np.float64), 0.0, 1.0)
    return (np.power(x, 1.0 / 2.2) * 255.0 + 0.5).astype(np.uint8)


def to_srgb_u8(img):
    return gamma_encode(np.asarray(img))


@jax.tree_util.register_dataclass
@dataclass
class Film:
    pixels: jax.Array  # (H, W, 3) float32

    @classmethod
    def zeros(cls, width: int, height: int) -> "Film":
        return cls(pixels=jnp.zeros((height, width, 3), jnp.float32))

    @property
    def width(self) -> int:
        return self.pixels.shape[1]

    @property
    def height(self) -> int:
        return self.pixels.shape[0]

    def add(self, img) -> "Film":
        return Film(pixels=self.pixels + img)

    def numpy(self) -> np.ndarray:
        return np.asarray(self.pixels)


@dataclass
class FilmGrid:
    """row x column montage of equally-sized sub-films (film_grid_t).

    Host-side convenience for the driver programs that tile many renders
    into one image (ky.cpp:4715-4905).
    """

    rows: int
    cols: int
    sub_width: int
    sub_height: int
    _cursor: int = 0
    pixels: np.ndarray = field(default=None)

    def __post_init__(self):
        if self.pixels is None:
            self.pixels = np.zeros(
                (self.rows * self.sub_height, self.cols * self.sub_width, 3),
                np.float32)

    def place(self, img) -> None:
        """Write the next sub-film (next_subfilm cursor, ky.cpp:1824-1827)."""
        img = np.asarray(img)
        assert img.shape[:2] == (self.sub_height, self.sub_width), img.shape
        r, c = divmod(self._cursor, self.cols)
        y0, x0 = r * self.sub_height, c * self.sub_width
        self.pixels[y0:y0 + self.sub_height, x0:x0 + self.sub_width] = img
        self._cursor += 1
