#!/usr/bin/env python
"""Top-level trainer entry point (the torch_train.py equivalent).

    python train.py -m unet -d shapes -l bce -o adam -b 8 -p 128 -e 5
"""
from segtpu.train_cli import main

if __name__ == "__main__":
    main()
