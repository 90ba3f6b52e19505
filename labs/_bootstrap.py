"""Put the repo root on sys.path so labs/ scripts can import bench and
mazu_tpu when run directly (``python labs/<script>.py`` puts labs/ on
sys.path[0], not the root). Imported at the top of every lab script."""

import os
import sys

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _root not in sys.path:
    sys.path.insert(0, _root)
