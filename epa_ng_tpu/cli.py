"""Command-line driver with EPA-ng flag parity.

Flags, groups, mutual exclusions and dispatch mirror the reference's CLI11
app (src/main.cpp:96-556): Convert (--bfast, --dump-binary, --split), Input
(-t/-s/-b/-q/-m), Output (filters, precision, --redo, --preserve-rooting),
Compute (heuristics, --chunk-size, --raxml-blo, --no-pre-mask,
--rate-scalers).

Run as ``python -m epa_ng_tpu.cli ...`` or via the ``epa-ng-tpu`` entry
point.
"""

from __future__ import annotations

import argparse
import logging
import os
import shlex
import sys
import time
from typing import Optional

from epa_ng_tpu import __version__
from epa_ng_tpu.utils.options import NumericalScaling, Options

log = logging.getLogger("epa_ng_tpu")

# machine-readable stats of the last completed placement run (float
# seconds; the logged "Time spent placing" mirrors the reference's
# integer-seconds format, src/main.cpp:545). Consumed by bench.py --e2e.
LAST_RUN_STATS: dict = {}

BANNER = r"""
    ______ ____   ___  ______ ____   __  __      ______ ____   __  __
   / ____// __ \ /   |/_  __// __ \ / / / /     /_  __// __ \ / / / /
  / __/  / /_/ // /| | / /  / /_/ // / / /______ / /  / /_/ // / / /
 / /___ / ____// ___ |/ /  / _, _// /_/ //_____// /  / ____// /_/ /
/_____//_/    /_/  |_/_/  /_/ |_| \____/       /_/  /_/     \____/
"""


def _nonneg_float(s: str) -> float:
    v = float(s)
    if v < 0:
        raise argparse.ArgumentTypeError(f"must be >= 0, got {s}")
    return v


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="epa-ng-tpu",
        description="TPU-native Massively-Parallel Evolutionary Placement")
    p.add_argument("-v", "--version", action="store_true",
                   help="Display version.")
    p.add_argument("--verbose", action="store_true",
                   help="Display debug output.")

    conv = p.add_argument_group("Convert")
    conv.add_argument("-c", "--bfast", metavar="FILE",
                      help="Convert the given fasta file to bfast format.")
    conv.add_argument("-B", "--dump-binary", action="store_true",
                      help="Binary dump mode: write ref. tree CLV store in "
                           "binary format then exit. NOTE: not compatible "
                           "with premasking!")
    conv.add_argument("--split", nargs="+", metavar="MSA",
                      help="Takes a reference MSA and combined ref+query "
                           "MSA(s); outputs query.fasta and reference.fasta. "
                           "Usage: --split ref_alignment query_alignments+")

    inp = p.add_argument_group("Input")
    inp.add_argument("-t", "--tree", help="Path to Reference Tree file.")
    inp.add_argument("-s", "--ref-msa", "--msa", dest="ref_msa",
                     help="Path to Reference MSA file.")
    inp.add_argument("-b", "--binary",
                     help="Path to binary reference file, as created using "
                          "--dump-binary.")
    inp.add_argument("-q", "--query", help="Path to Query MSA file.")
    inp.add_argument("-m", "--model", default=None,
                     help="Description string of the model to be used, or a "
                          "RAxML_info / raxml-ng .bestModel / IQ-TREE file.")

    out = p.add_argument_group("Output")
    out.add_argument("-w", "--outdir", "--out-dir", dest="outdir",
                     default="./", help="Path to output directory.")
    out.add_argument("--tmp", default="", help="Path to temporary directory.")
    out.add_argument("--filter-acc-lwr", type=float, default=None,
                     help="Accumulated likelihood weight after which further "
                          "placements are discarded.")
    out.add_argument("--filter-min-lwr", type=float, default=None,
                     help="Minimum likelihood weight below which a placement "
                          "is discarded.")
    out.add_argument("--filter-min", type=int, default=None,
                     help="Minimum number of placements per sequence.")
    out.add_argument("--filter-max", type=int, default=None,
                     help="Maximum number of placements per sequence.")
    out.add_argument("--precision", type=int, default=None,
                     help="Output decimal point precision.")
    out.add_argument("--redo", action="store_true",
                     help="Overwrite existing files.")
    out.add_argument("--preserve-rooting", choices=["on", "off"],
                     default="on",
                     help="Preserve the rooting of rooted trees.")
    out.add_argument("--out-file", default="epa_result.jplace",
                     help="Name of the jplace output file.")

    comp = p.add_argument_group("Compute")
    comp.add_argument("-g", "--dyn-heur", type=float, default=None,
                      metavar="X",
                      help="Two-phase heuristic, candidate edges by "
                           "accumulative LWR threshold (default 0.99999).")
    comp.add_argument("-G", "--fix-heur", type=float, default=None,
                      metavar="X",
                      help="Two-phase heuristic, candidate edges by "
                           "percentage of total edges.")
    comp.add_argument("--baseball-heur", action="store_true",
                      help="Baseball heuristic as known from pplacer. "
                           "strike_box=3, max_strikes=6, max_pitches=40.")
    comp.add_argument("--no-heur", action="store_true",
                      help="Disables heuristic preplacement completely.")
    comp.add_argument("--chunk-size", type=int, default=None,
                      help="Number of query sequences to read at a time.")
    comp.add_argument("--raxml-blo", action="store_true",
                      help="Old-style independent branch length optimization "
                           "instead of the sliding approach.")
    comp.add_argument("--opt-model", action="store_true",
                      help="ML-evaluate free model parameters and reference "
                           "tree branch lengths before placement (L-BFGS on "
                           "the jitted likelihood; alpha by golden "
                           "section).")
    comp.add_argument("--no-pre-mask", action="store_true",
                      help="Do NOT pre-mask sequences.")
    comp.add_argument("--rate-scalers", choices=["on", "off", "auto"],
                      default="auto",
                      help="Accepted for CLI parity; the TPU path always "
                           "uses per-site log-scale accumulators.")
    comp.add_argument("-T", "--threads", type=int, default=0,
                      help="Accepted for CLI parity; TPU path ignores it.")
    comp.add_argument("--compute-dtype", choices=["f32", "f64"],
                      default=None,
                      help="Device compute precision (TPU extension; "
                           "default f64 on CPU, f32 on TPU).")
    comp.add_argument("--blo-block", type=int, default=None,
                      help="Batch size for the thorough-placement Newton "
                           "kernel (TPU extension).")
    comp.add_argument("--memsave", action="store_true",
                      help="Out-of-core mode for trees whose tensors "
                           "exceed device HBM: reference state stays in "
                           "host RAM and streams to the device per chunk "
                           "(the analog of the reference's -b CLV "
                           "paging).")
    comp.add_argument("--memsave-budget", type=_nonneg_float, default=None,
                      metavar="GB",
                      help="--memsave device-cache budget in GB: a prefix "
                           "of the reference-state tensors stays "
                           "device-resident and only the rest streams "
                           "(default: auto from device memory; 0 = pure "
                           "streaming).")
    comp.add_argument("--lookup-dtype", choices=["auto", "bf16"],
                      default=None,
                      help="Preplacement lookup-table storage: bf16 halves "
                           "its HBM footprint on huge trees (TPU "
                           "extension; ranking-only precision impact).")
    comp.add_argument("--fused-topk", type=int, default=None,
                      help="Static candidate budget of the fused placement "
                           "step under the dynamic heuristic (TPU "
                           "extension; saturated queries re-run wider).")
    comp.add_argument("--pallas", choices=["auto", "on", "off"],
                      default=None,
                      help="Pallas Newton-kernel dispatch: auto "
                           "(default; used whenever supported), on "
                           "(error if unsupported), off (always the "
                           "XLA kernel; TPU extension).")
    comp.add_argument("--adaptive-split", action="store_true",
                      help="Multi-host runs: shard the query file "
                           "proportionally to each host's measured "
                           "placement rate (a short synthetic "
                           "calibration) instead of evenly — the "
                           "runtime consumer of the reference's "
                           "difficulty-proportional scheduler (TPU "
                           "extension).")
    comp.add_argument("--mesh", default=None, metavar="DPxEP",
                      help="Shard this process' placement over a local "
                           "device mesh, e.g. 4x2: queries data-parallel "
                           "over DP chips, lookup/BLO tensors edge-"
                           "sharded over EP chips (big-tree HBM "
                           "scaling; TPU extension).")
    comp.add_argument("--distributed", nargs="?", const="auto", default=None,
                      metavar="COORD,N,IDX",
                      help="Initialize jax.distributed for a multi-host "
                           "run: no value = auto-detect (SLURM/OpenMPI/TPU "
                           "pod env), or 'coordinator:port,num_procs,"
                           "process_id' explicitly. Alternatively set "
                           "EPA_NG_TPU_DISTRIBUTED. (The analog of the "
                           "reference's MPI_Init, src/main.cpp:53.)")
    return p


def _parse_mesh_spec(spec: str) -> tuple:
    """'DPxEP' -> (dp, ep), both >= 1."""
    try:
        dp_s, ep_s = spec.lower().split("x", 1)
        dp, ep = int(dp_s), int(ep_s)
    except ValueError:
        raise ValueError("want DPxEP, e.g. 4x2") from None
    if dp < 1 or ep < 1:
        raise ValueError("dp and ep must be >= 1")
    return dp, ep


def maybe_init_distributed(spec: Optional[str]):
    """jax.distributed.initialize() from --distributed / env. Must run
    before any other jax usage (it selects the global device topology)."""
    spec = spec or os.environ.get("EPA_NG_TPU_DISTRIBUTED") or None
    if spec is None:
        return
    import jax
    if spec in ("auto", "1", "true"):
        jax.distributed.initialize()
    else:
        try:
            coord, num, idx = spec.rsplit(",", 2)
            jax.distributed.initialize(
                coordinator_address=coord, num_processes=int(num),
                process_id=int(idx))
        except ValueError as e:
            raise SystemExit(
                f"Error: bad --distributed spec {spec!r} "
                "(want coordinator:port,num_procs,process_id)") from e


def options_from_args(args) -> Options:
    o = Options()
    excl = [bool(args.dyn_heur is not None), bool(args.fix_heur is not None),
            args.baseball_heur, args.no_heur]
    if sum(excl) > 1:
        raise SystemExit("Error: --dyn-heur, --fix-heur, --baseball-heur and "
                         "--no-heur are mutually exclusive")
    if args.filter_acc_lwr is not None and args.filter_min_lwr is not None:
        raise SystemExit("Error: --filter-acc-lwr and --filter-min-lwr are "
                         "mutually exclusive")
    if args.binary and (args.tree or args.ref_msa):
        raise SystemExit("Error: --binary excludes --tree/--ref-msa")

    if args.filter_acc_lwr is not None:
        o.acc_threshold = True
        o.support_threshold = args.filter_acc_lwr
    if args.filter_min_lwr is not None:
        o.acc_threshold = False
        o.support_threshold = args.filter_min_lwr
    if args.filter_min is not None:
        o.filter_min = args.filter_min
    if args.filter_max is not None:
        o.filter_max = args.filter_max
    if o.filter_min > o.filter_max:
        raise SystemExit("Error: filter-min must not exceed filter-max!")
    if args.precision is not None:
        o.precision = args.precision
    if args.dyn_heur is not None:
        o.prescoring = True
        o.prescoring_by_percentage = False
        o.prescoring_threshold = args.dyn_heur
    if args.fix_heur is not None:
        o.prescoring = True
        o.prescoring_by_percentage = True
        o.prescoring_threshold = args.fix_heur
    if args.baseball_heur:
        o.baseball = True
    if args.no_heur:
        o.prescoring = False
    if args.chunk_size is not None:
        o.chunk_size = args.chunk_size
    if args.raxml_blo:
        o.sliding_blo = False
    if args.opt_model:
        o.opt_model = True
    if args.no_pre_mask:
        o.premasking = False
        o.repeats = True
    o.scaling = NumericalScaling(args.rate_scalers)
    o.preserve_rooting = args.preserve_rooting == "on"
    o.tmp_dir = args.tmp
    o.dump_binary_mode = args.dump_binary
    o.load_binary_mode = bool(args.binary)
    o.num_threads = args.threads
    if args.compute_dtype is not None:
        o.compute_dtype = args.compute_dtype
    if args.blo_block is not None:
        o.blo_block = args.blo_block
    if args.lookup_dtype is not None:
        o.lookup_dtype = args.lookup_dtype
    if args.fused_topk is not None:
        o.fused_topk = args.fused_topk
    if args.pallas is not None:
        o.pallas = args.pallas
    o.memsave = args.memsave
    if args.memsave_budget is not None:
        o.memsave_budget_gb = args.memsave_budget
    return o


def _default_dtype() -> str:
    """f32 on accelerators (where f64 is emulated and slow), f64 on CPU."""
    import jax
    try:
        plat = jax.default_backend()
    except Exception:
        plat = "cpu"
    dtype = "f64" if plat == "cpu" else "f32"
    log.info("Selected: compute dtype %s (backend: %s)", dtype, plat)
    return dtype


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    args = build_parser().parse_args(argv)
    invocation = "epa-ng-tpu " + " ".join(shlex.quote(a) for a in argv)
    start_all = time.time()

    if args.version:
        print(f"epa-ng-tpu v{__version__}")
        return 0
    if not argv:
        build_parser().print_help()
        return 0

    options = options_from_args(args)
    outdir = args.outdir
    os.makedirs(outdir, exist_ok=True)

    # conversion modes need no log file
    if args.bfast:
        from epa_ng_tpu.io.bfast import fasta_to_bfast
        print("Converting given FASTA file to BFAST format...")
        result = fasta_to_bfast(args.bfast, outdir)
        print(f"Resulting bfast file was written to: {result}")
        return 0

    if args.split:
        if len(args.split) < 2:
            print("Incorrect number of inputs! Usage: epa-ng-tpu --split "
                  "ref_alignment query_alignments+", file=sys.stderr)
            return 1
        from epa_ng_tpu.utils.split import split
        ref, queries = args.split[0], args.split[1:]
        print(f"Splitting files based on reference: {ref}")
        split(ref, queries, outdir)
        return 0

    # persistent XLA compilation cache: repeat runs (and the many
    # same-shaped steps within a run) skip the minutes-long TPU compiles.
    # Both of these must run BEFORE anything initializes the backend
    # (process_info below does).
    import jax

    from epa_ng_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    # some out-of-tree TPU plugins ignore JAX_PLATFORMS=cpu; honor the
    # user's explicit platform choice via the config knob
    plat_env = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if plat_env:
        try:
            jax.config.update("jax_platforms", plat_env)
        except Exception as exc:  # noqa: BLE001 - warn, run on default
            print(f"WARNING: could not apply JAX_PLATFORMS={plat_env!r} "
                  f"({exc}); continuing on the default backend",
                  file=sys.stderr)

    # multi-host topology must be known before logging (per-rank log
    # files, rank-0-only stdout — reference: src/main.cpp:53-64,308-320)
    maybe_init_distributed(args.distributed)
    from epa_ng_tpu.parallel.dist import process_info
    pidx, pcount = process_info()

    from epa_ng_tpu.utils.logging import setup_logging
    setup_logging(outdir, verbose=args.verbose, redo=args.redo,
                  process_index=pidx, process_count=pcount)
    log.info(BANNER + f"(v{__version__})\n")

    # guard the RESULT file itself, not only the log: deleting the log
    # while keeping epa_result.jplace must not allow a silent clobber
    # (reference: src/main.cpp:315-320)
    if args.query and not args.redo:
        result_file = os.path.join(outdir, args.out_file)
        if os.path.exists(result_file):
            log.error("%s already exists! To overwrite existing output "
                      "files, rerun with --redo", result_file)
            return 1

    if args.compute_dtype is None:
        options.compute_dtype = _default_dtype()
    if options.compute_dtype == "f64":
        jax.config.update("jax_enable_x64", True)

    import numpy as np

    from epa_ng_tpu.core.engine import PlacementEngine
    from epa_ng_tpu.io import fasta as fio
    from epa_ng_tpu.models import Model

    if options.memsave:
        from epa_ng_tpu.core.memsave import OutOfCoreEngine
        engine_cls = OutOfCoreEngine
        log.info("Selected: out-of-core (--memsave) placement")
    else:
        engine_cls = PlacementEngine

    # under --mesh the reference state is BUILT on the CPU backend (host
    # RAM) and only its ep-SHARDS ever reach device HBM (attach_mesh) —
    # otherwise a tree whose tensors exceed one chip would OOM during
    # init, before sharding could help (the very case --mesh exists for)
    import contextlib
    build_ctx = contextlib.nullcontext()
    if args.mesh:
        # every knowable incompatibility is checked BEFORE the (possibly
        # minutes-long) reference-state build, not after it
        try:
            dp, ep = _parse_mesh_spec(args.mesh)
            if dp & (dp - 1):
                raise ValueError("dp must be a power of two")
            n_local = len(jax.local_devices())
            if dp * ep > n_local:
                raise ValueError(
                    f"{dp}x{ep} needs {dp * ep} local devices, "
                    f"have {n_local}")
            if options.memsave:
                raise ValueError("--mesh and --memsave are mutually "
                                 "exclusive")
        except ValueError as e:
            log.error("Bad --mesh %r: %s", args.mesh, e)
            return 1
        build_ctx = jax.default_device(jax.devices("cpu")[0])

    # --- build or load the reference state
    if options.load_binary_mode:
        from epa_ng_tpu.io.binary import load_binary
        log.info("Loading from binary: %s", args.binary)
        with build_ctx:
            engine = load_binary(args.binary, options,
                                 engine_cls=engine_cls)
        tree = engine.tree
        qry_info = fio.make_msa_info(args.query) if args.query else None
        if options.premasking:
            log.info("Premasking is limited to per-query ranges in binary "
                     "mode (the CLV store is built unmasked)")
    else:
        if not args.tree or not args.ref_msa:
            print("Error: --tree and --ref-msa (or --binary) are required",
                  file=sys.stderr)
            return 1
        if args.model is None:
            log.error(
                "A model has to be explicitly specified! You may specify it "
                "generically (GTR+G), however parameters will not be "
                "optimized. We recommend evaluating parameters with raxml-ng "
                "--evaluate and passing the resulting .bestModel file to "
                "--model.")
            return 1

        model_desc = args.model
        if os.path.isfile(model_desc):
            from epa_ng_tpu.io.model_files import parse_model_file
            log.info("Selected: Specified model file: %s", model_desc)
            model_desc = parse_model_file(model_desc)
        log.info("Selected: Specified model: %s", model_desc)
        model = Model.from_string(model_desc)

        from epa_ng_tpu.tree import Tree
        ref_info = fio.make_msa_info(args.ref_msa)
        qry_info = fio.make_msa_info(args.query) if args.query else None

        premask = options.premasking and not options.dump_binary_mode
        if qry_info is not None and premask:
            if ref_info.sites != qry_info.sites:
                log.error(
                    "The reference and query alignment files do not seem to "
                    "have the same alignment width! (%d vs. %d). Are the "
                    "query sequences not aligned?", ref_info.sites,
                    qry_info.sites)
                return 1
            fio.MSAInfo.or_mask(ref_info, qry_info)

        ref_msa = fio.build_msa_from_file(args.ref_msa, ref_info, premask)
        tree = Tree.from_file(args.tree, options.preserve_rooting)
        if options.opt_model:
            from epa_ng_tpu.core.evaluate import optimize_model
            import jax.numpy as jnp
            log.info("Optimizing model parameters and branch lengths")
            optimize_model(tree, ref_msa, model,
                           dtype=(jnp.float64
                                  if options.compute_dtype == "f64"
                                  else jnp.float32))
        with build_ctx:
            engine = engine_cls(tree, ref_msa, model, options)

        if options.dump_binary_mode:
            from epa_ng_tpu.io.binary import dump_binary
            log.info("Writing to binary")
            dump_file = os.path.join(outdir, "epa_binary_file")
            with open(args.tree) as f:
                dump_binary(engine, dump_file, f.read())
            log.info("Binary CLV store written to: %s.npz", dump_file)
            return 0

    if not args.query:
        log.error("Must supply query file! Combined MSA files not currently "
                  "supported, please split them and specify using -s and -q.")
        return 1

    if args.mesh:
        # shard this process' placement over a local device mesh
        from epa_ng_tpu.parallel.mesh import make_mesh
        try:
            dp, ep = _parse_mesh_spec(args.mesh)
            engine.attach_mesh(make_mesh(dp, ep, jax.local_devices()))
        except ValueError as e:
            log.error("Bad --mesh %r: %s", args.mesh, e)
            return 1

    # --- placement loop (the analog of simple_mpi, src/core/place.cpp:173)
    from epa_ng_tpu.io.jplace import JplaceWriter
    from epa_ng_tpu.parallel.dist import merge_jplace_shards

    start_place = time.time()

    # --adaptive-split: rate-proportional query shards (the runtime
    # consumer of the scheduling math, parallel.schedule). Each host
    # measures its own placement rate on a synthetic calibration chunk;
    # the rate vector is allgathered (or forced via
    # EPA_NG_TPU_CALIBRATION_RATES="r0,r1,..." for tests/known-skew
    # clusters) and every host derives the identical contiguous split.
    shard = None
    if args.adaptive_split and pcount > 1:
        from epa_ng_tpu.parallel import schedule as sched
        forced = os.environ.get("EPA_NG_TPU_CALIBRATION_RATES")
        if forced:
            rates = [float(x) for x in forced.split(",")]
            if len(rates) != pcount:
                log.error("EPA_NG_TPU_CALIBRATION_RATES has %d entries "
                          "for %d processes", len(rates), pcount)
                return 1
        else:
            rate = engine.calibration_rate()
            import jax as _jax
            if _jax.process_count() > 1:
                from jax.experimental import multihost_utils
                rates = np.asarray(multihost_utils.process_allgather(
                    np.asarray([rate]))).reshape(-1).tolist()
            else:
                # env-topology ranks cannot exchange rates; keep even
                log.warning("--adaptive-split: no jax.distributed "
                            "topology to exchange rates; keeping the "
                            "even split (set "
                            "EPA_NG_TPU_CALIBRATION_RATES to force)")
                rates = [1.0] * pcount
        shares = sched.proportional_shares(qry_info.sequences, rates)
        shard = shares[pidx]
        log.info("Adaptive split: rates %s -> shards %s (this rank: "
                 "offset %d, %d queries)",
                 [round(r, 1) for r in rates],
                 shares, shard[0], shard[1])

    reader = fio.make_msa_reader(args.query, qry_info, options.premasking,
                                 split=True, process_index=pidx,
                                 process_count=pcount, shard=shard)
    out_file = args.out_file
    shard_name = out_file if pcount == 1 else f"{out_file}.shard{pidx}"
    # --tmp: host-local files (e.g. node-local SSD) hold the shards
    # (reference: src/main.cpp --tmp semantics)
    shard_dir = options.tmp_dir if (pcount > 1 and options.tmp_dir) else outdir
    log.info("Output file: %s", os.path.join(outdir, out_file))
    tree_string = tree.numbered_newick(options.precision)
    writer = JplaceWriter(shard_dir, shard_name, tree_string, invocation,
                          tree.mapper, precision=options.precision,
                          fragment=(pcount > 1))

    # async streaming pipeline: reader thread -> device compute -> writer
    # thread (the analog of the reference's __PREFETCH overlap)
    from epa_ng_tpu.core.pipeline import StreamingPipeline

    from epa_ng_tpu.core import chunk as chunk_mod

    progress = {"done": 0, "reads": 0}

    def read_chunk():
        # matrix-native readers hand back an EncodedChunk straight from the
        # native scanner; MSA readers go through the vectorized encoder
        read_encoded = getattr(reader, "read_next_encoded", None)
        if read_encoded is not None:
            ec = read_encoded(options.chunk_size, engine.model.num_states)
            if ec is None or not len(ec):
                return None
            ec = engine.check_chunk(ec)
        else:
            chunk = reader.read_next(options.chunk_size)
            if not len(chunk):
                return None
            ec = engine.encode_msa(chunk)
        # collapse duplicate reads: place once, report every name
        # (reference: src/set_manipulators.cpp:208-226); a big win on
        # metagenomic data where identical short reads are common
        return chunk_mod.collapse(ec)

    def compute(ec, index):
        # dispatch only: the device crunches this chunk while the writer
        # thread syncs + assembles the previous one (finalize_chunk)
        offset = progress["done"] + reader.local_seq_offset
        handle = engine.place_encoded_async(ec, seq_id_offset=offset)
        progress["done"] += len(ec)
        return handle, ec.num_reads

    stage_s = {"finalize": 0.0, "emit": 0.0}

    def write(item):
        handle, nreads = item
        t0 = time.perf_counter()
        result = engine.finalize_chunk(handle)
        t1 = time.perf_counter()
        writer.write(result)
        stage_s["emit"] += time.perf_counter() - t1
        stage_s["finalize"] += t1 - t0
        progress["reads"] += nreads
        log.info("%d Sequences done!", progress["reads"])

    pipeline = StreamingPipeline(read_chunk, compute, write)
    pipeline.run()
    writer.close()
    log.debug("Stage times: read %.2fs compute %.2fs write %.2fs",
              pipeline.read_timer.sum(), pipeline.compute_timer.sum(),
              pipeline.write_timer.sum())

    if pcount > 1:
        from epa_ng_tpu.parallel.dist import barrier
        barrier()
        if pidx == 0:
            merge_jplace_shards(shard_dir, out_file, pcount, tree_string,
                                invocation, final_dir=outdir)

    LAST_RUN_STATS.clear()
    LAST_RUN_STATS.update(
        placing_s=time.time() - start_place,
        total_s=time.time() - start_all,
        reads=progress["reads"],
        sequences=progress["done"],
        read_s=pipeline.read_timer.sum(),
        compute_s=pipeline.compute_timer.sum(),
        write_s=pipeline.write_timer.sum(),
        # write_s split: device sync + result assembly (finalize) vs
        # jplace text formatting + file write (emit)
        finalize_s=stage_s["finalize"],
        emit_s=stage_s["emit"])
    log.info("Time spent placing: %ds", int(time.time() - start_place))
    log.info("Elapsed Time: %ds", int(time.time() - start_all))
    return 0


def entry() -> None:
    """Console-script entry point (pyproject [project.scripts])."""
    sys.exit(main())


if __name__ == "__main__":
    sys.exit(main())
