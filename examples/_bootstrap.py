"""Make the repo root importable so examples run without installing.

``python examples/<name>.py`` puts examples/ on sys.path but not the repo
root; importing this module first fixes that (and is a no-op if dynode_tpu
is installed).
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
