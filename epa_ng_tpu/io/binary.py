"""Binary CLV store: dump/load the full reference-tree placement state.

Equivalent of the reference's --dump-binary / -b machinery
(src/io/Binary.cpp): a preprocessing run builds the edge CLV tensors once and
serializes them; placement runs (e.g. a fleet of hosts) then map them
straight into device memory without touching the reference MSA.

Format: a single .npz holding the edge tensors, the original newick text
(re-parsed on load so edge numbering and rooted-tree mapping are rebuilt
identically), and the fully-resolved model descriptor.
"""

from __future__ import annotations

import numpy as np


def resolved_model_descriptor(model) -> str:
    """A descriptor string that fully pins every model parameter."""
    name = "PROTGTR" if model.num_states == 20 else "GTR"
    parts = [name]
    parts.append("{" + "/".join(repr(float(v)) for v in model.subst_rates) + "}")
    parts.append("+FU{" + "/".join(repr(float(v)) for v in model.base_freqs) + "}")
    if model.pinv > 0:
        parts.append("+IU{" + repr(float(model.pinv)) + "}")
    if model.num_ratecats > 1 and model.rate_het == "gamma":
        mode = "a" if model.gamma_mode == "median" else "m"
        parts.append(f"+G{model.num_ratecats}{mode}{{{model.alpha!r}}}")
    elif model.num_ratecats > 1:
        parts.append(f"+R{model.num_ratecats}")
        parts.append("{" + "/".join(repr(float(v)) for v in model.ratecat_rates) + "}")
        parts.append("{" + "/".join(repr(float(v)) for v in model.ratecat_weights) + "}")
    return "".join(parts)


def dump_binary(engine, path: str, tree_newick_text: str):
    et = engine.edges
    inter = (engine._ref_intersection if engine._ref_intersection is not None
             else np.zeros(0, dtype=np.uint32))
    np.savez_compressed(
        path,
        U=np.asarray(et.U), V=np.asarray(et.V),
        lsU=np.asarray(et.lsU), lsV=np.asarray(et.lsV),
        lengths=np.asarray(et.lengths),
        tree_newick=np.array(tree_newick_text),
        model_desc=np.array(resolved_model_descriptor(engine.model)),
        ref_intersection=inter,
        num_sites=np.array(engine.num_sites),
        format_version=np.array(2))  # v2: site-last [E,R,K,S] tensor layout


def load_binary(path: str, options=None):
    """Rebuild a PlacementEngine from a dumped CLV store."""
    import jax.numpy as jnp

    from epa_ng_tpu.core.engine import PlacementEngine
    from epa_ng_tpu.models import Model
    from epa_ng_tpu.ops.clv import EdgeTensors
    from epa_ng_tpu.tree import Tree
    from epa_ng_tpu.utils.options import Options

    data = np.load(path, allow_pickle=False)
    version = int(data["format_version"]) if "format_version" in data else 0
    if version != 2:
        raise ValueError(
            f"{path}: binary CLV store format v{version} is not supported "
            "by this build (expected v2) — re-run --dump-binary")
    options = options or Options()
    tree = Tree.from_string(str(data["tree_newick"]),
                            preserve_rooting=options.preserve_rooting)
    model = Model.from_string(str(data["model_desc"]))
    dtype = jnp.float64 if options.compute_dtype == "f64" else jnp.float32
    edges = EdgeTensors(
        U=jnp.asarray(data["U"], dtype), V=jnp.asarray(data["V"], dtype),
        lsU=jnp.asarray(data["lsU"], dtype), lsV=jnp.asarray(data["lsV"], dtype),
        lengths=jnp.asarray(data["lengths"], dtype))
    inter = data["ref_intersection"]
    return PlacementEngine.from_precomputed(
        tree=tree, model=model, options=options, edges=edges,
        num_sites=int(data["num_sites"]),
        ref_intersection=(inter if inter.size else None))
