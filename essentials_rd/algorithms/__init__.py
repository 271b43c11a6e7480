from .pagerank import PageRankProgram, pagerank
from .cc import ConnectedComponentsProgram, cc_incremental, connected_components
from .lp import LabelPropagationProgram, label_propagation
from .spmv import SpmvProgram, spmv
from .tc import triangle_counts
from .bfs import BfsProgram, bfs
from .sssp import SsspProgram, sssp
from .ppr import PprProgram, ppr
from .kcore import KcoreProgram, coreness, kcore
from .spgemm import spgemm
from .eigencentrality import EigenCentralityProgram, eigencentrality
from .color import ColorProgram, color
from .msf import boruvka_msf
from .geo import GeoProgram, geo
from .bc import betweenness
from .hits import HitsProgram, hits, hits_graph_edges, hits_table
from .scc import scc_coloring
from .harmonic import MultiSourceBfsProgram, harmonic, harmonic_table
from .mis import MisProgram, mis, mis_table
from .longest_path import LongestPathProgram, longest_path, depth_table
from .matching import maximal_matching
from .katz import KatzProgram, katz, katz_table
from .fastrp import FastRPProgram, fastrp, fastrp_table
from .squares import squares_total
from .sweep import sweep_profile
from .hyperball import hyperball, hyperball_estimates
from .temporal import TemporalReachProgram, arrival_table, temporal_reach
from .louvain import modularity_move_round
from .wl import wl_refine, wl_refine_local
from .widest import WidestProgram, widest_path, widths_table
from .bridges import ForestBfsProgram, find_bridges, forest_bfs
from .densest import densest_peel

__all__ = [
    "ForestBfsProgram",
    "find_bridges",
    "densest_peel",
    "forest_bfs",
    "WidestProgram",
    "widest_path",
    "widths_table",
    "maximal_matching",
    "KatzProgram",
    "katz",
    "katz_table",
    "FastRPProgram",
    "fastrp",
    "fastrp_table",
    "squares_total",
    "sweep_profile",
    "hyperball",
    "hyperball_estimates",
    "TemporalReachProgram",
    "temporal_reach",
    "arrival_table",
    "modularity_move_round",
    "wl_refine",
    "wl_refine_local",
    "LongestPathProgram",
    "longest_path",
    "depth_table",
    "PageRankProgram",
    "pagerank",
    "ConnectedComponentsProgram",
    "connected_components",
    "LabelPropagationProgram",
    "label_propagation",
    "SpmvProgram",
    "spmv",
    "triangle_counts",
    "BfsProgram",
    "bfs",
    "SsspProgram",
    "sssp",
    "PprProgram",
    "ppr",
    "KcoreProgram",
    "kcore",
    "coreness",
    "spgemm",
    "EigenCentralityProgram",
    "eigencentrality",
    "ColorProgram",
    "color",
    "boruvka_msf",
    "GeoProgram",
    "geo",
    "betweenness",
    "HitsProgram",
    "hits",
    "scc_coloring",
    "hits_graph_edges",
    "hits_table",
    "MultiSourceBfsProgram",
    "harmonic",
    "harmonic_table",
    "MisProgram",
    "mis",
    "mis_table",
]
