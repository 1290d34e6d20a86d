from mma_tpu.models.node_classifier import NodeClassifier
from mma_tpu.models.zinc_net import ZincNet

__all__ = ["NodeClassifier", "ZincNet"]
