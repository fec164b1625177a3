"""Runtime options for a placement run.

Field names and defaults mirror the reference implementation's single runtime
config struct (reference: src/util/Options.hpp:6-35) so behavior-parity tests
can sweep the same combinations.
"""

from __future__ import annotations

import dataclasses
import enum


class NumericalScaling(enum.Enum):
    ON = "on"
    OFF = "off"
    AUTO = "auto"


@dataclasses.dataclass
class Options:
    # heuristic / preplacement
    prescoring: bool = True
    prescoring_by_percentage: bool = False
    prescoring_threshold: float = 0.99999
    baseball: bool = False

    # model / branch optimization
    opt_model: bool = False
    sliding_blo: bool = True

    # output filtering (reference: src/util/Options.hpp:17-20)
    support_threshold: float = 0.01
    acc_threshold: bool = False
    filter_min: int = 1
    filter_max: int = 7

    # io / streaming
    chunk_size: int = 5000
    premasking: bool = True
    dump_binary_mode: bool = False
    load_binary_mode: bool = False
    tmp_dir: str = ""
    precision: int = 10

    # compute
    num_threads: int = 0  # kept for CLI parity; TPU path ignores it
    # CLI-parity flag (reference enables libpll SITE_REPEATS when
    # premasking is off, src/main.cpp:393-397). The TPU analog —
    # site-pattern compression of the reference-state build — is
    # controlled by pattern_compression below and is ALWAYS beneficial,
    # so it does not key off this flag.
    repeats: bool = False
    # site-pattern compression (SITE_REPEATS analog): run the CLV scan /
    # lookup build / BLO transform once per unique alignment column,
    # weight the ref logl by pattern multiplicity. Semantically invisible;
    # off only for A/B testing.
    pattern_compression: bool = True
    scaling: NumericalScaling = NumericalScaling.AUTO
    preserve_rooting: bool = True

    # TPU-specific extensions (no reference analog)
    compute_dtype: str = "f64"  # "f32" | "f64"; bench/TPU runs use f32
    max_blo_iters: int = 32  # outer smoothings (reference: optimize.cpp:269)
    blo_phase1_smoothings: int = 2  # phase-1 cap of the convergence compaction
    max_newton_iters: int = 30  # inner NR iterations (reference: optimize.cpp:62)
    blo_block: int = 4096  # padded batch size for vmapped Newton BLO
    # candidate budget of the fused fast path: 16 keeps the saturation
    # fallback (queries whose accumulated-LWR cut wants more edges) to
    # ~0.1% of queries at +60% step cost vs 8, a large net win since each
    # saturated query re-runs the exact host-orchestrated path
    fused_topk: int = 16
    pallas: str = "auto"  # "auto" | "on" | "off": Pallas Newton kernel use
    # "auto": full [E,C,S] table in the compute dtype; "bf16": (resid bf16,
    # mean f32) split — halves the dominant big-tree HBM buffer at <0.1
    # logl-unit preplacement-score error (candidate RANKING, not reported
    # logls; the thorough stage recomputes exact logls)
    lookup_dtype: str = "auto"
    # out-of-core mode: reference state in host RAM, streamed per chunk
    # (core.memsave; the analog of the reference's -b paging)
    memsave: bool = False
    # --memsave device-cache budget in GB: a PREFIX of the reference-state
    # tensors stays device-resident (the analog of the reference's paged
    # memory pool, src/tree/Tree.cpp:80-117) and only the remainder
    # streams per chunk. None = auto (a fraction of device memory);
    # 0 = pure streaming (nothing O(E*S) device-resident)
    memsave_budget_gb: float | None = None
