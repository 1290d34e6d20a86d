"""Convert a PyG ZINC-subset checkout to the mma_tpu npz schema.

Run in an environment with torch_geometric + network access:

    python scripts/convert_zinc.py --pyg-root /path/to/data/ZINC \
        --out datasets/

Produces ``zinc_{train,val,test}.npz`` with the schema documented in
``mma_tpu/data/zinc.py`` (num_nodes, num_edges, node_types, edge_src,
edge_dst, edge_types, y). The reference pipeline downloads the same data
at first run (graph_regression/mma.py:46-49).
"""

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pyg-root", required=True)
    p.add_argument("--out", default="datasets")
    args = p.parse_args()

    from torch_geometric.datasets import ZINC  # requires network/torch_geometric

    os.makedirs(args.out, exist_ok=True)
    for split in ("train", "val", "test"):
        ds = ZINC(args.pyg_root, subset=True, split=split)
        num_nodes, num_edges = [], []
        node_types, edge_src, edge_dst, edge_types, ys = [], [], [], [], []
        for data in ds:
            num_nodes.append(data.num_nodes)
            num_edges.append(data.edge_index.shape[1])
            node_types.append(data.x.view(-1).numpy().astype(np.int32))
            edge_src.append(data.edge_index[0].numpy().astype(np.int32))
            edge_dst.append(data.edge_index[1].numpy().astype(np.int32))
            edge_types.append(data.edge_attr.view(-1).numpy().astype(np.int32))
            ys.append(float(data.y))
        np.savez_compressed(
            os.path.join(args.out, f"zinc_{split}.npz"),
            num_nodes=np.asarray(num_nodes, np.int64),
            num_edges=np.asarray(num_edges, np.int64),
            node_types=np.concatenate(node_types),
            edge_src=np.concatenate(edge_src),
            edge_dst=np.concatenate(edge_dst),
            edge_types=np.concatenate(edge_types),
            y=np.asarray(ys, np.float32),
        )
        print(f"wrote zinc_{split}.npz ({len(ys)} graphs)")


if __name__ == "__main__":
    main()
