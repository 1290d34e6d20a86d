"""Dataclass configs with the reference's README command lines as presets.

Every hyperparameter the reference hardcodes or silently ignores
(SURVEY §2.3 — e.g. ``--batch_size`` vs hardcoded 64, towers=5, 4 layers,
hidden 75) is an explicit, honored field here. The presets reproduce
``README.md:58,64,70,79``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class NodeClassificationConfig:
    dataset: str = "cora"
    aggregators: Tuple[str, ...] = ("mean", "max", "min")  # train.py:33 default
    scalers: Tuple[str, ...] = ("identity", "amplification", "attenuation")
    lr: float = 0.01
    epochs: int = 200
    weight_decay: float = 5e-4
    hidden: int = 16
    dropout: float = 0.5
    activation: str = "new_sigmoid"
    sigmoid_k: float = 2.0
    seed: int = 42
    parity: bool = True
    parity_eval_dropout: bool = False  # N2: reference eval keeps dropout on
    fastmode: bool = False  # train.py:21 — skip the eval-mode re-forward
    use_pallas: bool = False
    # jax matmul precision for quality runs. TPU MXU default rounds f32
    # operands to bf16, which costs ~1-2 points of accuracy on these small
    # models (QUALITY.md); "highest" forces full-f32 MXU passes.
    matmul_precision: Optional[str] = "highest"
    log_path: Optional[str] = None
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 0  # epochs; 0 = off
    resume: bool = False  # restore latest checkpoint from checkpoint_dir


@dataclasses.dataclass(frozen=True)
class ZincConfig:
    aggregators: Tuple[str, ...] = ("min", "max")
    scalers: Tuple[str, ...] = ("identity", "amplification", "linear")
    lr: float = 1e-4
    epochs: int = 200
    weight_decay: float = 3e-4
    batch_size: int = 64  # the reference hardcodes 64 (mma.py:52-54)
    hidden: int = 75
    edge_hidden: int = 50
    towers: int = 5
    num_layers: int = 4
    pre_layers: int = 1
    post_layers: int = 1
    mlp_sizes: Tuple[int, ...] = (75, 50, 25, 1)
    # ReduceLROnPlateau (mma.py:137)
    lr_factor: float = 0.5
    lr_patience: int = 20
    min_lr: float = 1e-5
    seed: int = 42
    parity: bool = True
    parity_eval_dropout: bool = False
    subset_size: Optional[int] = None  # cap dataset size (CI/smoke)
    n_node_per_graph: int = 40  # padding budget per graph slot
    n_edge_per_graph: int = 100
    use_pallas: bool = False
    remat: bool = False
    # Conv edge pipeline knobs (see MultiMaskConv): compute dtype
    # ("float32"|"bfloat16"|"auto"), edge layout ("auto"|"csr"|"ell"),
    # and the static in-degree bound (ZINC ≤ 4, mma.py:57-60).
    compute_dtype: str = "float32"
    edge_format: str = "auto"
    max_degree_hint: Optional[int] = 4
    # Batch collate layout: "auto" takes the degree-exact ELL collate
    # (nodes grouped by exact in-degree; aggregation becomes reshapes +
    # lane reduces — the round-5 fast path) whenever edge_format allows
    # ELL routing; "plain" keeps per-graph-contiguous nodes;
    # "degree_exact" forces the exact collate.
    batch_layout: str = "auto"
    matmul_precision: Optional[str] = "highest"  # see NodeClassificationConfig
    log_path: Optional[str] = None
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 0
    resume: bool = False


# README-reproduction presets (README.md:58,64,70,79 / BASELINE.md).
NODE_CLS_PRESETS = {
    "pubmed": NodeClassificationConfig(
        dataset="pubmed",
        aggregators=("min", "min2", "min3", "min4"),
        lr=0.01, epochs=500, weight_decay=5e-4, hidden=16, dropout=0.5,
    ),
    "citeseer": NodeClassificationConfig(
        dataset="citeseer",
        aggregators=("min", "min2", "min3"),
        lr=0.01, epochs=500, weight_decay=3e-4, hidden=128, dropout=0.5,
    ),
    "cora": NodeClassificationConfig(
        dataset="cora",
        aggregators=("mean", "mean2"),
        lr=0.001, epochs=200, weight_decay=3e-4, hidden=64, dropout=0.75,
    ),
}

ZINC_PRESET = ZincConfig(
    aggregators=("min", "max"),
    scalers=("identity", "amplification", "linear"),
    weight_decay=3e-4, lr=1e-4, epochs=10000,
)
