"""Large-graph node-classification training via neighbor sampling (DP).

The production counterpart of the ogbn-scale bench regime (SURVEY §5.7,
BASELINE config[4]): the C++ multithreaded sampler feeds per-device
subgraphs from a producer thread, features/labels live in device-resident
tables gathered by node ids, and one data-parallel step trains per batch.

    python -m mma_tpu.cli.train_sampled --nodes 200000 --avg-deg 25 \
        --batch-size 512 --fanouts 10,10,5 --steps 50

With ``--features/--labels/--edges`` (npz/npy arrays) it trains on real
host data instead of the synthetic power-law stand-in.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--nodes", type=int, default=200_000)
    p.add_argument("--avg-deg", type=int, default=25)
    p.add_argument("--edges", type=str, default=None,
                   help="npz with src/dst int32 arrays (else synthetic)")
    p.add_argument("--features", type=str, default=None,
                   help="npy (N, F) float32 feature table")
    p.add_argument("--labels", type=str, default=None,
                   help="npy (N,) int labels")
    p.add_argument("--n-feat", type=int, default=100)
    p.add_argument("--n-class", type=int, default=47)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--aggregators", type=str, default="mean,mean2")
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--fanouts", type=str, default="10,10,5")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute-dtype", type=str, default="auto")
    p.add_argument("--use-ell", action="store_true",
                   help="per-hop ELL bucket layout (scatter-free paths)")
    p.add_argument("--host-built", action="store_true",
                   help="ship full host-built Graphs instead of the "
                        "default minimal-transfer pipeline (src/dst/ids "
                        "+ CSC perm, structure derived on device)")
    p.add_argument("--log", type=str, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp

    from mma_tpu.data.sampling import NeighborSampler
    from mma_tpu.models import NodeClassifier
    from mma_tpu.parallel import make_mesh
    from mma_tpu.train.logger import JsonlLogger
    from mma_tpu.train.optim import make_optimizer
    from mma_tpu.train.sampled import (
        DeviceTableAssembler,
        make_sampled_dp_step,
        sampled_batch_producer,
    )

    rs = np.random.RandomState(args.seed)
    fanouts = tuple(int(f) for f in args.fanouts.split(","))
    if args.edges:
        z = np.load(args.edges)
        src, dst = z["src"], z["dst"]
        n = int(max(src.max(), dst.max())) + 1
    else:
        n = args.nodes
        m = n * args.avg_deg // 2
        a = (rs.rand(m) ** 2 * n).astype(np.int64)
        b = rs.randint(0, n, size=m)
        keep = a != b
        src = np.concatenate([a[keep], b[keep]]).astype(np.int32)
        dst = np.concatenate([b[keep], a[keep]]).astype(np.int32)
    sampler = NeighborSampler.from_host_arrays(
        src, dst, n, fanouts, seed=args.seed
    )

    features = (np.load(args.features) if args.features
                else rs.randn(min(n, 65536), args.n_feat).astype(np.float32))
    labels = (np.load(args.labels) if args.labels
              else rs.randint(0, args.n_class, features.shape[0]))
    n_class = int(labels.max()) + 1

    # Calibrate per-hop budgets on a few real samples.
    hop_max = np.zeros(len(fanouts) + 1, np.int64)
    max_edges = 0
    for _ in range(3):
        hc, _, s_c, _ = sampler._structure(
            rs.randint(0, n, args.batch_size),
            sampler._structural_node_bound(args.batch_size),
            sampler._structural_edge_bound(args.batch_size),
        )
        hop_max = np.maximum(hop_max, hc)
        max_edges = max(max_edges, len(s_c))
    hop_pads = tuple(
        int(-(-int(c * 1.5) // 256) * 256) if i else args.batch_size
        for i, c in enumerate(hop_max)
    )
    n_node_pad = -(-(sum(hop_pads) + 1) // 4096) * 4096
    n_edge_pad = -(-int(max_edges * 1.5) // 4096) * 4096

    devices = jax.devices()
    n_dev = len(devices)
    model = NodeClassifier(
        n_feat=features.shape[1], n_hidden=args.hidden, n_class=n_class,
        aggregators=tuple(args.aggregators.split(",")),
        dropout_rate=args.dropout, compute_dtype=args.compute_dtype,
    )
    params = model.init(jax.random.PRNGKey(args.seed))
    opt = make_optimizer(args.lr)
    opt_state = opt.init(params)
    mesh = make_mesh(("data",), devices=devices)
    step = make_sampled_dp_step(model, opt, mesh, "data", use_pallas=True)
    assembler = DeviceTableAssembler(features, labels)
    rngs = jax.random.split(jax.random.PRNGKey(args.seed + 1), n_dev)
    log = JsonlLogger(args.log)

    seed_batches = (
        rs.randint(0, n, size=(n_dev, args.batch_size))
        for _ in range(args.steps)
    )
    t0 = time.time()
    for i, (x, g, y, sm) in enumerate(sampled_batch_producer(
        sampler, seed_batches, assembler,
        n_node_pad=n_node_pad, n_edge_pad=n_edge_pad,
        hop_node_pads=hop_pads if args.use_ell else None,
        device_finish=not args.host_built,
        deg_table=jnp.asarray(sampler.true_deg),
    )):
        params, opt_state, loss = step(params, opt_state, x, g, y, sm, rngs)
        if i % 10 == 0 or i == args.steps - 1:
            jax.block_until_ready(loss)
            log.log(step=i, loss=float(loss), t=round(time.time() - t0, 2))
            print(f"step {i}: loss {float(loss):.4f} "
                  f"({time.time() - t0:.1f}s)", flush=True)
    log.close()
    return params


if __name__ == "__main__":
    main()
