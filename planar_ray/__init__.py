"""planar_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch rebuild of the *capabilities* of
SICS-Fundamental-Research-Center/Planar (reference read-only at
``/root/reference``): PageRank, weakly connected components, label
propagation, SSSP/k-hop and triangle counting over an edge table derived
from a source-code Parquet corpus — expressed as Ray Data pipelines
(``map_batches`` over zero-copy Arrow batches, actor pools for stateful
CSR stages, ``groupby`` shuffles for the BSP message exchange), not a
port of the reference's C++ thread-pool/io_uring engine.

Layout:
  corpus.py      deterministic synthetic source-code corpus (input_hint schema)
  ingest.py      corpus -> string-keyed edge table (imports + containment)
  graph.py       edge table -> dense-id, range-partitioned Graph on parquet
  superstep.py   BSP superstep engine (scatter/shuffle/apply + checkpoint)
  kernels/       pagerank, wcc, lpa, sssp, khop, triangle
  pipelines/     testdata-graph adapters, dedup, text analysis, ANN, multimodal
"""

__version__ = "0.1.0"
