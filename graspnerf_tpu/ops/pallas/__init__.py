"""Pallas TPU kernels for the hot loops.

- ibrnet_fuse: the IBRNet-NeuS per-view MLP stack + cross-view fusion
  (ref src/nr/network/ibrnet.py:445-513 up to the geometry head) as one
  VMEM-resident kernel: every Dense stays on-chip between layers instead of
  round-tripping [V,N,C] activations through HBM.
"""
from .ibrnet_fuse import view_fuse, view_fuse_reference  # noqa: F401
