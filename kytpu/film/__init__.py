from kytpu.film.film import Film, FilmGrid, gamma_encode, to_srgb_u8  # noqa: F401
from kytpu.film.io import write_ppm, write_bmp, write_hdr, write_image  # noqa: F401
