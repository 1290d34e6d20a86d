from mma_tpu.nn.layers import Dense, Embedding, BatchNorm, MLP, dropout
from mma_tpu.nn.gcn import GraphConvolution
from mma_tpu.nn.mma_layer import MMALayer
from mma_tpu.nn.mma_conv import MultiMaskConv

__all__ = [
    "Dense",
    "Embedding",
    "BatchNorm",
    "MLP",
    "dropout",
    "GraphConvolution",
    "MMALayer",
    "MultiMaskConv",
]
