from mma_tpu.parallel.mesh import make_mesh, initialize_distributed
from mma_tpu.parallel.edge_parallel import (
    shard_graph,
    graph_shard_spec,
    make_edge_sharded_forward,
    make_edge_sharded_train_step,
    pad_edges_for_sharding,
)
from mma_tpu.parallel.data_parallel import (
    stack_batches,
    shard_stacked_batch,
    make_dp_train_step,
)
from mma_tpu.parallel.dp_edge import (
    shard_batches_dp_edge,
    make_dp_edge_forward,
    make_dp_edge_train_step,
)
from mma_tpu.parallel.node_sharded import (
    NodeShardedGraph,
    build_node_sharded,
    make_node_sharded_forward,
    halo_exchange,
)

__all__ = [
    "make_mesh",
    "initialize_distributed",
    "shard_graph",
    "graph_shard_spec",
    "make_edge_sharded_forward",
    "make_edge_sharded_train_step",
    "pad_edges_for_sharding",
    "stack_batches",
    "shard_stacked_batch",
    "make_dp_train_step",
    "shard_batches_dp_edge",
    "make_dp_edge_forward",
    "make_dp_edge_train_step",
    "NodeShardedGraph",
    "build_node_sharded",
    "build_node_sharded_ordered",
    "partition_order",
    "make_node_sharded_forward",
    "halo_exchange",
]
