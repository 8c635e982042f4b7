"""Tile-count derivation for blocked-GEMM operators.

Blocked-GEMM queries (``pairwise_stats_gemm``, ``q_dedup_embedding``)
replicate each input row into B tiles and run one Arrow kernel per
unordered block pair; a tile holds two blocks ≈ ``2·n·row_bytes/B``.  A
hard-coded B is a bench-scale artifact (VERDICT r4 watch-list): at 100 TB
the tile must stay executor-sized, so B is derived from the relation size
with the operator's measured-good local value as the floor.  Results are
B-invariant by construction — every unordered pair lands in exactly one
tile for ANY B — which tests/test_scale_knobs.py pins by comparing two
block counts.
"""

from __future__ import annotations

#: Soft cap on one tile's Arrow payload.  Chosen so the per-task working
#: set (two blocks + kernel temporaries, a few × tile bytes) stays well
#: inside a typical executor-core memory share.
TARGET_TILE_BYTES = 128 << 20


def gemm_block_count(
    n_rows: int, row_bytes: int, floor: int = 4, target_tile_bytes: int = TARGET_TILE_BYTES
) -> int:
    """Smallest block count whose two-block tile stays under
    ``target_tile_bytes``; ``floor`` keeps at least floor·(floor+1)/2
    tiles so small inputs still spread over executor cores."""
    b = -(-2 * n_rows * row_bytes // target_tile_bytes)  # ceil div
    return max(floor, int(b))
