"""nerfca_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of NeRF-CA.

NeRF-CA (arXiv 2408.16355) reconstructs a dynamic 4D (3D + cardiac phase)
coronary-artery scene from extremely sparse X-ray angiography projections by
decomposing it into a static background field and a time-conditioned dynamic
field, rendered with Beer-Lambert X-ray transmission integration and trained
with an annealed battery of separation regularizers.

This package is a from-scratch TPU-first implementation with the same
capability surface as the PyTorch/TIGRE reference (kirstenmaas/NeRF-CA):

- ``nerfca_tpu.geometry`` — C-arm cone-beam geometry, poses, ray generation
  (reference: ``train/proj_helpers.py``, ``preprocess/tigre_helpers.py``).
- ``nerfca_tpu.ops`` — positional encodings with annealing windows, depth
  sampling, X-ray transmission rendering, regularizer losses, the cone-beam
  projector that replaces TIGRE's CUDA ``Ax``
  (reference: ``train/model_helpers.py``, ``model/*.py`` encoder code).
- ``nerfca_tpu.models`` — static (CPPN) and temporal field MLPs as pure
  functions over parameter pytrees (reference: ``model/CPPN.py``,
  ``model/Temporal.py``).
- ``nerfca_tpu.data`` — dataset builder with the reference's artifact
  contract, synthetic phantoms, XCAT/CCTA pipelines
  (reference: ``preprocess/*``).
- ``nerfca_tpu.train`` — jitted train steps, config surface, drivers,
  checkpointing, logging, sweeps (reference: ``train/run_composite.py``,
  ``train/run_nerf.py``, ``train/data_helpers.py``).
- ``nerfca_tpu.parallel`` — SPMD data/depth parallelism over a
  ``jax.sharding.Mesh`` (no analog in the single-GPU reference).

Unlike the reference, everything inside the training step — ray sampling,
encoding annealing, rendering, losses, the optimizer update — runs on device
under a single ``jax.jit``.
"""

__version__ = "0.1.0"
