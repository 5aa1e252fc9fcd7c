"""Pallas TPU kernels for the hot path.

The entire per-step compute of NeRF-CA is: encode 512k points, run two
4x128 MLPs, reduce along rays. Unfused, every layer boundary round-trips a
[512k, 128] activation through HBM — the op is bandwidth-bound by ~15x over
its FLOPs. The fused kernels here keep the whole encode->MLP pipeline in
VMEM per tile (weights resident, activations tiled), turning it
compute-bound.
"""
