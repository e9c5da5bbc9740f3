"""Shared helpers for the Pallas kernels."""


def round_up(v: int, m: int) -> int:
    """Smallest multiple of ``m`` >= ``v``."""
    return -(-v // m) * m
