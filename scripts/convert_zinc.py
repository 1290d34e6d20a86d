"""Convert a PyG ZINC-subset checkout to the mma_tpu npz schema.

Run in an environment with torch_geometric + network access:

    python scripts/convert_zinc.py --pyg-root /path/to/data/ZINC \
        --out datasets/

Produces ``zinc_{train,val,test}.npz`` with the schema documented in
``mma_tpu/data/zinc.py`` (num_nodes, num_edges, node_types, edge_src,
edge_dst, edge_types, y). The reference pipeline downloads the same data
at first run (graph_regression/mma.py:46-49).

The conversion logic is importable (``records_from_dataset`` /
``write_split``) so its output schema is pinned by
``tests/test_data_readiness.py`` against the loader without needing
torch_geometric — the day the real blobs land, quality runs need zero
code changes.
"""

import argparse
import os

import numpy as np


def records_from_dataset(ds):
    """Extract flat arrays from an iterable of PyG-style Data objects.

    Each item needs ``num_nodes``, ``edge_index`` (2, E), ``x`` (N, 1)
    node types, ``edge_attr`` (E,) edge types, ``y`` scalar — exactly the
    attributes PyG's ZINC-subset provides.
    """
    num_nodes, num_edges = [], []
    node_types, edge_src, edge_dst, edge_types, ys = [], [], [], [], []
    for data in ds:
        num_nodes.append(int(data.num_nodes))
        num_edges.append(int(data.edge_index.shape[1]))
        node_types.append(np.asarray(data.x).reshape(-1).astype(np.int32))
        edge_src.append(np.asarray(data.edge_index[0]).astype(np.int32))
        edge_dst.append(np.asarray(data.edge_index[1]).astype(np.int32))
        edge_types.append(np.asarray(data.edge_attr).reshape(-1).astype(np.int32))
        ys.append(float(data.y))
    return {
        "num_nodes": np.asarray(num_nodes, np.int64),
        "num_edges": np.asarray(num_edges, np.int64),
        "node_types": np.concatenate(node_types),
        "edge_src": np.concatenate(edge_src),
        "edge_dst": np.concatenate(edge_dst),
        "edge_types": np.concatenate(edge_types),
        "y": np.asarray(ys, np.float32),
    }


def write_split(out_dir: str, split: str, records: dict) -> str:
    path = os.path.join(out_dir, f"zinc_{split}.npz")
    np.savez_compressed(path, **records)
    return path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pyg-root", required=True)
    p.add_argument("--out", default="datasets")
    args = p.parse_args()

    from torch_geometric.datasets import ZINC  # requires network/torch_geometric

    os.makedirs(args.out, exist_ok=True)
    for split in ("train", "val", "test"):
        ds = ZINC(args.pyg_root, subset=True, split=split)
        records = records_from_dataset(ds)
        write_split(args.out, split, records)
        print(f"wrote zinc_{split}.npz ({len(records['y'])} graphs)")


if __name__ == "__main__":
    main()
