"""Distributed GNN training (DistGCN_15d rebuild, TPU-native)."""

from .gcn import GCN, GCNConfig, gcn_forward, init_gcn_params
from .graph import (Graph, ShardedGraph, normalize_edges, partition_edges,
                    shard_node_array, synthetic_sbm)

__all__ = [
    "GCN", "GCNConfig", "gcn_forward", "init_gcn_params", "Graph",
    "ShardedGraph", "normalize_edges", "partition_edges",
    "shard_node_array", "synthetic_sbm",
]
