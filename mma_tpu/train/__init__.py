from mma_tpu.train.optim import make_optimizer, ReduceLROnPlateau
from mma_tpu.train.metrics import accuracy, mae
from mma_tpu.train.config import (
    NodeClassificationConfig,
    ZincConfig,
    NODE_CLS_PRESETS,
    ZINC_PRESET,
)
from mma_tpu.train.loops import train_node_classification, train_zinc
from mma_tpu.train.resilience import ResilientRunner

__all__ = [
    "ResilientRunner",
    "make_optimizer",
    "ReduceLROnPlateau",
    "accuracy",
    "mae",
    "NodeClassificationConfig",
    "ZincConfig",
    "NODE_CLS_PRESETS",
    "ZINC_PRESET",
    "train_node_classification",
    "train_zinc",
]
