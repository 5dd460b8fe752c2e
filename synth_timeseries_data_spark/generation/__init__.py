"""Generation layer: the sequential SCM recurrence kernel (G4-G6)."""

from .kernel import (  # noqa: F401
    generate_block_missing_config,
    generate_confounded_config,
    generate_irregular_config,
    generate_linear_config,
    generate_mcar_config,
    generate_mixed_missing_config,
    generate_poly_config,
    generate_poly_mixture_config,
    generate_trend_season_config,
    generate_trig_irregular_config,
    irregular_timestamps,
    topo_order,
)
