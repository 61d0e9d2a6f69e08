"""deepsir_tpu — a TPU-native point-cloud registration framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the PyTorch
reference LeoQLi/DeepSIR (see SURVEY.md): RandLA-Net feature backbone,
semantic-label / detection-description / scan-alignment pipelines, iterative
correspondence search with a learned-inlier weighted-Kabsch pose solve, and
dataloaders + evaluation harnesses for 3DMatch / KITTI odometry / Oxford
RobotCar.

Design principles (TPU-first, not a port):
  * static shapes everywhere — clouds padded/resampled to a fixed point count
  * the whole per-pair pipeline (index pyramid -> 3 RandLA passes -> tiled
    matching -> SVD x iters) compiles into one XLA program
  * `lax.scan` registration loops, `vmap` over pairs, `shard_map` over a mesh
  * Pallas kernels for the bandwidth-bound hot ops (KNN, distance+argmin)
"""

__version__ = "0.1.0"
