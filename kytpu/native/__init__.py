"""Optional native (C++) host-side components.

`film_io` is a ctypes binding to a small C++ encoder for the BMP/HDR image
writers (the reference's only native host-side runtime besides the render
loop itself, ky.cpp:1646-1782). Build with `python -m kytpu.native.build`;
everything degrades gracefully to the numpy implementations when absent.
"""
