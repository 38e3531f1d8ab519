"""Regularized trainer CLI (reference torch_train_reg.py).

Same grid loop with an L1-on-conv-kernels / L2-on-conv-biases penalty added
to the scaled loss: ``batch_size * loss + l1 + l2`` (torch_train_reg.py:97).
The penalty is fused into the same compiled train step.

    python train_reg.py -m unet -d shapes -l bce -o adam -b 8 -e 10
"""

from __future__ import annotations

from segtpu.regularization import make_conv2d_penalty
from segtpu.train_cli import main as _main


def main(argv=None, l1_factor: float = 0.0005, l2_factor: float = 0.0005):
    return _main(argv, param_penalty=make_conv2d_penalty(l1_factor, l2_factor))


if __name__ == "__main__":
    main()
