from mma_tpu.ops.segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_min,
    segment_softmax_denom,
)
from mma_tpu.ops.aggregators import AggSpec, get_agg_spec, NODE_CLS_AGGREGATORS
from mma_tpu.ops.masked_aggregate import masked_multi_aggregate, mma_mask_logits
from mma_tpu.ops.spmm import binary_spmm
from mma_tpu.ops.scalers import apply_scalers, SCALER_NAMES
from mma_tpu.ops.gather import gather_by_dst, gather_by_src
from mma_tpu.ops.ell import (
    EllSpec,
    ell_expand,
    ell_gather_nodes_by_src,
    masked_minmax_firsthit,
    masked_slot_sum,
    single_width_spec,
)

__all__ = [
    "EllSpec",
    "ell_expand",
    "ell_gather_nodes_by_src",
    "masked_minmax_firsthit",
    "masked_slot_sum",
    "single_width_spec",
    "gather_by_dst",
    "gather_by_src",
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_min",
    "segment_softmax_denom",
    "AggSpec",
    "get_agg_spec",
    "NODE_CLS_AGGREGATORS",
    "masked_multi_aggregate",
    "mma_mask_logits",
    "binary_spmm",
    "apply_scalers",
    "SCALER_NAMES",
]
