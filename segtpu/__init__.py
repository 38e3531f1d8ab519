"""segtpu — TPU-native segmentation networks benchmark.

A ground-up JAX / Flax / XLA / Pallas rebuild of the capabilities of
BloodAxe/segmentation-networks-benchmark (reference mounted at /root/reference):
a benchmark harness for binary semantic segmentation that trains a zoo of
U-Net-family encoder-decoders over a grid of model x dataset x loss x optimizer
configurations, with TensorBoard + CSV observability, best/last checkpointing,
and sliding-window tiled inference with weighted blending and D4 TTA for huge
satellite images.

Design (TPU-first, not a port):
  * NHWC layout everywhere (TPU-preferred), static shapes, one jitted
    ``train_step`` containing forward+backward+update+metrics.
  * Data parallelism via ``jax.sharding.Mesh`` + jit shardings: the batch axis
    is sharded over the ``data`` mesh axis; BatchNorm statistics become
    globally synchronized for free because the batch reductions are expressed
    over the full (logically global) arrays and XLA inserts the collectives.
  * The reference's single native component (the inplace_abn CUDA extension,
    reference lib/modules/abn/functions.py:1) is re-built as a fused
    BN+activation op with a memory-saving custom VJP that reconstructs
    gradients from the *output* activations (segtpu/ops/abn.py), with a Pallas
    TPU kernel for the fused normalize+activation hot path.
  * Tiled inference (reference lib/tiles.py) is vectorized: tiles are a batch
    axis processed under jit, and the overlap-weighted merge is an XLA
    scatter-add instead of a Python accumulation loop.
"""

__version__ = "0.1.0"
