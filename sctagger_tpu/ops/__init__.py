from .myers import (  # noqa: F401
    build_peq_single,
    build_peq_multi,
    hw_scores_scan,
    shw_scores_scan,
    match_block_min,
    match_block_mask,
)
