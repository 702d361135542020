"""Interop with the reference PyTorch implementation.

``reference`` loads the reference repo's torch modules on CPU and converts
their weights into this framework's flax parameter pytrees — the migration
path for reference-trained checkpoints and the oracle for parity tests.
"""
