#!/usr/bin/env python
"""Tiled-inference / submission entry point (the inria_submit.py equivalent)."""
from segtpu.submit_cli import main

if __name__ == "__main__":
    main()
