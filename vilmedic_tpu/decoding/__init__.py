from .decode import (  # noqa: F401
    BeamResult,
    RolloutResult,
    beam_search,
    greedy_search,
    sample,
    tile_for_beams,
)
