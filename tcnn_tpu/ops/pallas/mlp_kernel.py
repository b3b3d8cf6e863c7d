"""Pallas fully-fused MLP kernel (TPU).

Placeholder: raises NotImplementedError so FullyFusedMLP falls back to the
identical-math XLA path until the kernel lands. The kernel design (mirroring
the *intent* of kernel_mlp_fused, src/fully_fused_mlp.cu:499-632, redesigned
for the MXU):

  - grid over batch tiles (rows on the 128-wide lane dim, features on
    sublanes - the TPU analog of the reference's CM-data/RM-weights layout)
  - all layer weights staged in VMEM once per tile (the analog of weights in
    wmma fragments/shared memory)
  - matmul -> activation chained in VMEM across hidden layers, fp32
    accumulation on the MXU
  - training mode additionally writes per-layer activations to HBM for the
    backward kernel (the reference's out_intermediate)
"""

from __future__ import annotations


def fused_mlp_apply(mlp, params, x, *, compute_dtype):
    raise NotImplementedError("Pallas fused MLP kernel not yet implemented")
