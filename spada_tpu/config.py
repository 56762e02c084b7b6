"""Typed configuration for the whole framework.

The reference scatters its tuning surface across a JSON file
(``frontend.rs:8-23``, ``config/config_1mb_row1.json``) and hard-coded
constants (``simulator.rs:449-455``, ``scheduler.rs:203``,
``rowwise_perf_adjust.rs:125-126``, ``rowwise_adjust.rs:227-234``,
``colwise_reg_adjust.rs:39``).  Here every one of those knobs is surfaced in a
single dataclass, together with the TPU-native tunables that replace the
simulated micro-architecture.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass
class SpadaConfig:
    # ---- workload locations (reference: OmegaConfig, frontend.rs:8-23) ----
    ss_filepath: str = "./matrices"
    nn_filepath: str = "./matrices/nn_gemm.pkl"

    # ---- simulated-machine knobs, kept for the traffic/functional model ----
    # (reference: config_1mb_row1.json + simulator.rs:449-455)
    pe_num: int = 2
    at_num: int = 16
    lane_num: int = 8
    cache_size: int = 1_572_864          # fiber-cache bytes (1.5 MiB)
    word_byte: int = 8
    block_shape: Tuple[int, int] = (1, 10_000_000)
    mem_latency: int = 30                # cycles
    cache_latency: int = 0               # cycles
    freq: float = 1.0                    # GHz
    channel: int = 16
    bandwidth_per_channel: float = 8.0   # bytes/cycle
    # hard-wired datapath params (simulator.rs:449-455)
    sb_size: int = 4                     # stream-buffer depth
    pb_size: int = 8                     # psum-buffer depth
    pop_num_per_lane: int = 2
    sn_latency: int = 4                  # sorting-network latency
    mt_latency: int = 4                  # merge-tree latency
    tree_width: int = 8                  # adder-tree width

    # ---- adaptive-policy knobs ----
    # (reference: scheduler.rs:203, rowwise_*_adjust.rs, colwise_*_adjust.rs)
    adjust_scheme: int = 3               # 0 cost / 1 colwise-reg / 2 colwise-irr / 3 latency
    var_factor: float = 1.5              # row-group segmentation threshold
    group_diviser: int = 128             # wide-vs-narrow group split
    sample_num: int = 4                  # blocks sampled per candidate height
    cost_miss_weight: int = 100          # DRAM-traffic weight in the cost metric
    colwise_block_width: int = 8         # scheme-1 fixed block width

    # ---- TPU-native execution knobs (new; replace the simulated uarch) ----
    tile_n: int = 128                    # output-tile lane width (MXU column dim)
    tile_k: int = 128                    # contraction-tile depth (MXU row dim)
    tm_choices: Tuple[int, ...] = (8, 16, 32, 64, 128)  # candidate row-panel heights
    default_tm: int = 128
    dataflow: str = "spada"              # 'spada' | 'ip' | 'op' | 'rowwise'
    vmem_limit_bytes: Optional[int] = None
    engine: str = "auto"                 # 'auto' | 'streaming' | 'cached' | 'panel' | 'xla' | 'pallas_grid'
    engine_dtype: str = "float32"        # tile dtype: 'float32' | 'bfloat16'
    use_pallas: Optional[bool] = None    # legacy: True forces 'pallas_grid'
    precision: str = "highest"           # 'highest' (true f32) | 'default' (bf16 MXU)
    acc_dtype: str = "float32"
    # memory budget for densifying C in the outer-product path (bytes)
    dense_c_budget: int = 2 << 30
    # element-granular (ESC) path: chunk cap and dispatch policy
    # ('auto' = byte/overhead cost model picks tile vs element per matrix;
    #  'never'/'always' force one side — the reference's dataflow adaptivity
    #  lifted to the density axis)
    element_cap: int = 512
    element_dispatch: str = "auto"
    # element numeric executor: 'auto' (pallas on TPU — its cross-sublane
    # reduces beat XLA's minor-dim reduces, 1.03 vs 1.20 ms on locpl-64k;
    # xla elsewhere, where pallas would run interpreted), 'xla' (fused
    # elementwise/reduce ops), or 'pallas' (pipelined streaming kernels,
    # ops/element_stream)
    element_backend: str = "auto"
    # plan-time layout densification inside spgemm() (C-invariant subset:
    # k-grid anchor + k permutation; row permutations need the caller to
    # carry an inverse, so they only apply via preprocess_densified/CLI)
    densify: str = "auto"                # 'auto' | 'off'

    # measured per-work-item non-MXU overhead by tile edge (v5e, cached
    # engine, honest harness — tools/probe_item_overhead.py; slot configs
    # (12,24,8,8)/(12,24,8,8)/(6,10,4,6)/(6,10,4,2)).  The T=512 value is
    # low because ogroup=2 keeps the f32 accumulators VMEM-cheap there.
    # The previous values (0.15/0.49/1.26/2.49 us) were fitted under the
    # old harness, whose phantom operand pass grew with tile bytes and
    # biased the planner toward small T.
    engine_item_overhead_s: dict = dataclasses.field(
        default_factory=lambda: {128: 0.18e-6, 256: 0.31e-6,
                                 384: 0.72e-6, 512: 0.23e-6}
    )
    # per-item decomposition fitted to the same measurements (non-MXU part
    # scales with the f32 accumulate footprint tm*tn; see BENCH_NOTES.md):
    # t_item = 2*tm*tk*tn/peak + acc*tm*tn + fixed
    engine_acc_s_per_elem: float = 4.8e-12
    engine_item_fixed_s: float = 60e-9

    # ---- HBM roofline constants of the target chip (v5e defaults) ----
    hbm_bytes_per_s: float = 819e9
    peak_flops_f32: float = 98e12
    peak_flops_bf16: float = 197e12
    # per-link one-way ICI bandwidth (v5e: 4 links / chip, 2-D torus;
    # ~45 GB/s each way per link) — the weak-scaling projection input
    ici_bytes_per_s: float = 45e9
    ici_links: int = 4

    @classmethod
    def fast(cls, **overrides) -> "SpadaConfig":
        """Throughput profile: bf16 tiles, fast MXU passes, adaptive tile
        size (the bench configuration).  Accuracy: ~bf16 input rounding
        (values within ~0.5% of f32); use the default profile for the
        scipy-exact f32 path."""
        cfg = cls(engine_dtype="bfloat16", precision="default", **overrides)
        return cfg

    @classmethod
    def from_json(cls, path: str) -> "SpadaConfig":
        """Load a config JSON.

        Accepts both this framework's full schema and the reference's flat
        schema (``parse_config``, frontend.rs:77-85) — unknown keys are
        rejected, missing keys take defaults.
        """
        with open(path) as f:
            raw = json.load(f)
        field_names = {f.name for f in dataclasses.fields(cls)}
        unknown = set(raw) - field_names
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        if "block_shape" in raw:
            raw["block_shape"] = tuple(raw["block_shape"])
        if "tm_choices" in raw:
            raw["tm_choices"] = tuple(raw["tm_choices"])
        return cls(**raw)

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    # ---- derived quantities ----
    @property
    def bandwidth_bytes_per_cycle(self) -> float:
        return self.channel * self.bandwidth_per_channel

    @property
    def cache_words(self) -> int:
        """Fiber-cache capacity in words (``capability``, storage.rs:498)."""
        return self.cache_size // self.word_byte
