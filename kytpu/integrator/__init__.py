from kytpu.integrator.path import (  # noqa: F401
    PathConfig, li_path, li_direct_lighting, li_aov, make_li,
)
from kytpu.integrator.render import render, render_aov  # noqa: F401
