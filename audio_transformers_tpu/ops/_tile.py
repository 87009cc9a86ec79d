"""Shared tile-geometry helpers for the Pallas kernels. One definition:
kernel padding/alignment logic must never diverge between kernels."""

from __future__ import annotations


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
