#!/usr/bin/env python
"""Thin shim: checkpoint conversion CLI (pidnet_tpu.tools.convert)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pidnet_tpu.tools.convert import main

if __name__ == "__main__":
    main()
