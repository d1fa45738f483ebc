"""Shared shape-padding helper (single source for the lane-alignment floor)."""

from __future__ import annotations


def pad_pow2(n: int, lo: int = 8) -> int:
    """Next power of two >= n (floor lo): detection buffers pad to pow2 so
    jitted steps compile per shape bucket, not per count."""
    p = lo
    while p < n:
        p *= 2
    return p
