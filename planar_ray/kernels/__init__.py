from .coloring import ColoringKernel, coloring
from .gnn import GNNKernel, gnn
from .lpa import LPAKernel, lpa
from .pagerank import PageRankKernel, ReferencePageRankKernel, pagerank, pagerank_reference
from .randomwalk import random_walk, road_dataset
from .sssp import SSSPKernel, WeightedSSSPKernel, khop_counts, sssp, wsssp
from .coreness import CorenessDeltaKernel, CorenessKernel, coreness
from .triangle import triangle_count
from .mst import boruvka
from .wcc import WCCKernel, hop_extrema_seeds, wcc, wcc_precomputed
from .kcore import KCoreKernel, kcore
from .mis import MISKernel, mis
from .ppr import PPRKernel, ppr
from .hits import HITSKernel, hits, lift_graph

__all__ = [
    "PageRankKernel", "ReferencePageRankKernel", "pagerank", "pagerank_reference",
    "WCCKernel", "wcc", "LPAKernel", "lpa",
    "SSSPKernel", "sssp", "khop_counts", "triangle_count",
    "WeightedSSSPKernel", "wsssp", "CorenessKernel",
    "CorenessDeltaKernel", "coreness",
    "ColoringKernel", "coloring", "GNNKernel", "gnn",
    "random_walk", "road_dataset", "boruvka", "wcc_precomputed", "hop_extrema_seeds",
    "KCoreKernel", "kcore", "MISKernel", "mis", "PPRKernel", "ppr",
    "HITSKernel", "hits", "lift_graph",
]
