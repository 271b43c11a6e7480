"""essentials_rd — a Ray-Data-native link-graph analytics engine.

A from-scratch reimplementation of the graph-primitive capabilities of
bkj/essentials (a fork of gunrock/essentials, the CUDA "Essentials"
graph library) on Ray Data: PageRank, connected components (hash-min),
label propagation, triangle counting and SpMV, expressed as streaming
bulk-synchronous supersteps over an edge table derived from a
source-code corpus (repo→repo edges via shared paths and import
references, content sha256 preserved per row).

Architecture (SURVEY.md §2, §4; BASELINE.json north_star):
- every superstep = ``map_batches`` gather-scatter over zero-copy Arrow
  CSR partition shards held in actor-pool state, followed by a
  groupby-aggregate shuffle on destination-vertex hash;
- skew tamed by per-source-partition pre-combine + explicit hub salting;
- per-superstep Parquet checkpoints with per-partition lineage and
  message-count metrics; resume-after-kill.

NOTE on reference citations: the reference snapshot at /root/reference
was EMPTY during the survey and build sessions (SURVEY.md §0), so
docstrings cite upstream gunrock/essentials paths from public knowledge
(tagged [U]) instead of file:line into /root/reference.
"""

__version__ = "0.1.0"
