"""Put the repo root on sys.path so ``python scripts/<x>.py`` works
from any cwd without PYTHONPATH (direct script execution only adds
scripts/ itself)."""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
