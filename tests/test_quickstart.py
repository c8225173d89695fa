"""examples/quickstart.py runs end to end and actually learns."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_quickstart_end_to_end():
    import quickstart

    out = quickstart.main()
    # the color-separable task must be solved after prompt tuning
    assert out["acc1"] >= 90.0
    assert out["probe"] >= 0.9
