"""Pallas TPU kernels for the hottest inner loops.

Kernels are optional accelerations of the XLA paths in
:mod:`commpy_tpu.ops`; every op has an XLA fallback so the framework runs
on CPU/GPU/interpret mode unchanged.
"""
