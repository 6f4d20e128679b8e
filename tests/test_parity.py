"""Opt-in pixel-parity gate against the COMPILED C++ reference.

Run with `pytest -m parity` (excluded from the default suite: it compiles
/root/reference/ky.cpp and renders the production 1024^2 config with both
renderers — minutes of work, and it needs the reference sources present).
This makes the round-1 parity measurement (BASELINE.md: cross-renderer
diff 0.0055 vs noise floor 0.0042) executable instead of historical.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parity
def test_compiled_reference_parity():
    if not os.path.exists("/root/reference/ky.cpp"):
        pytest.skip("reference sources not available")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import parity_ci

    rc = parity_ci.main_with_args(spp=16, tolerance=1.75)
    assert rc == 0, "cross-renderer diff exceeded tolerance x noise floor"
