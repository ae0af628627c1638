from .decode import (  # noqa: F401
    BeamResult,
    RolloutResult,
    beam_search,
    greedy_and_sample,
    greedy_search,
    sample,
    stack_for_rollouts,
    tile_for_beams,
)
