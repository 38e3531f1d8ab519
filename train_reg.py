#!/usr/bin/env python
"""Regularized trainer entry point (the torch_train_reg.py equivalent)."""
from segtpu.train_reg_cli import main

if __name__ == "__main__":
    main()
