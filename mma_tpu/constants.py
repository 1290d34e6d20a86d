"""Shared static tiling constants.

BLOCK_R / BLOCK_B are the fused-kernel row-block and edge-chunk sizes
(``mma_tpu.ops.pallas.fused_mma``); graph builders compute the per-graph
``chunk_hint`` against these so the kernel grid is static under ``jit``.
EDGE_PAD_MULTIPLE is a multiple of BLOCK_B so edge arrays tile exactly.
"""

import os

BLOCK_R = 128  # output rows per kernel block
BLOCK_B = 1024  # edges per kernel chunk
# Contraction width per MXU pass of the one-hot sum kernels. Swept on
# v5e at the headline shapes (round 4): 512 beats 128 by +16% fwd /
# +9% train on the lean edge program (fewer, bigger (R, S)×(S, C) dots
# amortize the per-sub-chunk select/onehot VPU work); must divide
# BLOCK_B. Env-overridable for re-tuning on other parts.
BLOCK_SUB = int(os.environ.get("MMA_BLOCK_SUB", "512"))
if BLOCK_B % BLOCK_SUB:
    raise ValueError(
        f"MMA_BLOCK_SUB={BLOCK_SUB} must divide BLOCK_B={BLOCK_B}"
    )
NODE_PAD_MULTIPLE = 8
EDGE_PAD_MULTIPLE = BLOCK_B

# Scoped-VMEM budget (MB) the wide-channel kernels size their blocks
# against. The TPU default scoped limit is 16 MB; launchers that raise it
# (bench.py / the training CLIs set
# ``--xla_tpu_scoped_vmem_limit_kib=65536``, v5e has 128 MB VMEM) export
# MMA_VMEM_BUDGET_MB to match — bigger blocks mean fewer sequential grid
# steps, and per-step overhead dominates wide-channel workloads (ZINC:
# 375 lanes → bwd grid 736 steps at a 10 MB budget vs ~190 at 48 MB).
VMEM_BUDGET_MB = int(os.environ.get("MMA_VMEM_BUDGET_MB", "10"))
