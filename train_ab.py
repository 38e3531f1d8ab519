#!/usr/bin/env python
"""Afterburner trainer entry point (the torch_train_ab.py equivalent)."""
from segtpu.train_ab_cli import main

if __name__ == "__main__":
    main()
