"""Shared static tiling constants.

BLOCK_R / BLOCK_B are the fused-kernel row-block and edge-chunk sizes
(``mma_tpu.ops.pallas.fused_mma``); graph builders compute the per-graph
``chunk_hint`` against these so the kernel grid is static under ``jit``.
EDGE_PAD_MULTIPLE is a multiple of BLOCK_B so edge arrays tile exactly.
"""

BLOCK_R = 128  # output rows per kernel block
BLOCK_B = 1024  # edges per kernel chunk (8 × 128-lane sub-chunks)
BLOCK_SUB = 128  # contraction width per MXU pass
NODE_PAD_MULTIPLE = 8
EDGE_PAD_MULTIPLE = BLOCK_B
