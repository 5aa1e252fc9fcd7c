"""Training layer: config surface, jitted steps, drivers, checkpointing,
logging, sweeps.

Reference parity: ``train/run_composite.py``, ``train/run_nerf.py``,
``train/data_helpers.py`` in kirstenmaas/NeRF-CA.
"""
