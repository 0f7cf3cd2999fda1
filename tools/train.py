#!/usr/bin/env python
"""Thin shim preserving the reference CLI layout (tools/train.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pidnet_tpu.tools.train import main

if __name__ == "__main__":
    main()
