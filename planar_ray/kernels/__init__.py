from .pagerank import PageRankKernel, ReferencePageRankKernel, pagerank, pagerank_reference
from .wcc import WCCKernel, wcc
from .lpa import LPAKernel, lpa
from .sssp import SSSPKernel, sssp, khop_counts
from .triangle import triangle_count

__all__ = [
    "PageRankKernel", "ReferencePageRankKernel", "pagerank", "pagerank_reference",
    "WCCKernel", "wcc", "LPAKernel", "lpa",
    "SSSPKernel", "sssp", "khop_counts", "triangle_count",
]
