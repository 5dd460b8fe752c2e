"""Generation layer: the sequential SCM recurrence kernel (G4-G6)."""

from .kernel import generate_linear_config, topo_order  # noqa: F401
