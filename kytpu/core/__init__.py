from kytpu.core import frame, math, rng  # noqa: F401
