"""Equation-DSL layer: registries (G1) and the edge-list grammar (G2)."""

from .registry import EQUATION_ROWS, equations  # noqa: F401
