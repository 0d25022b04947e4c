"""Aero/thrust table data for MinimumTimeToClimb (identical to the
top-level `examples/MinimumTimeToClimbTables.py`; the reference ships a
verbatim copy in UpdatedInterface/)."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from MinimumTimeToClimbTables import *          # noqa: F401,F403
