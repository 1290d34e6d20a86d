from mma_tpu.data.planetoid import PlanetoidData, load_planetoid
from mma_tpu.data.zinc import ZincDataset, load_zinc
from mma_tpu.data.batching import batch_graphs

__all__ = [
    "PlanetoidData",
    "load_planetoid",
    "ZincDataset",
    "load_zinc",
    "batch_graphs",
]
