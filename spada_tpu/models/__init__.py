"""Analytical models of the memory system and workload families.

- :mod:`spada_tpu.models.traffic` — the functional (round-based, non-cycle)
  traffic model with reference-exact counter semantics (the capability of the
  reference's ``storage.rs`` counters and the legacy
  ``storage_traffic_model.rs``).
- :mod:`spada_tpu.models.sparse_nn` — sparse neural-net layer workloads (the
  "NN" workload category, py2rust.rs:5-60) and a flagship block-sparse MLP
  whose forward step runs on the tile engine.
"""
