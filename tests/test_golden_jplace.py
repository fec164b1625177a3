"""Golden-jplace regression corpus.

The brute-force oracle (tests/reference_impl.py) pins the MATH; these
goldens pin the SERIALIZED OUTPUT — numbered-newick text, rooted-edge
renumbering, field order, fixed-point precision, JSON layout (reference:
src/io/jplace_util.cpp:66-110). A formatting or renumbering regression that
leaves logls intact fails here and nowhere else.

Goldens live in tests/golden/ and were produced by tools/make_goldens.py
with the brute-force-verified engine (CPU, f64 — the tests' conftest
backend). Regenerate deliberately with ``python tools/make_goldens.py``
after an INTENDED output change and review the diff.

Plus a loose top-edge concordance check against the reference repo's own
RAxML-EPA artifact (test/data/raxml_output.jplace).
"""

import json
import os
import re

import pytest

from epa_ng_tpu.cli import main

D = "/root/reference/test/data"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

MODEL = "GTR{1.1/2.9/0.8/1.2/3.4/1}+FU{0.27/0.23/0.24/0.26}+G4{0.6}"
AA_TREE = ("(Cow:0.2,((Chicken:0.3,(Human:0.25,Loach:0.45):0.1):0.05,"
           "(Mouse:0.15,(Seal:0.2,Whale:0.1):0.08):0.12):0.06,Frog:0.35);")

CONFIGS = ["dna_heur", "dna_noheur", "dna_rooted", "aa_lg",
           "dna_baseball_prec4", "dna_fixheur_filters"]


def config_args(name: str, workdir: str) -> list:
    """CLI args (sans -w/--redo) for one golden configuration."""
    if name == "dna_heur":
        return ["-t", f"{D}/ref.tre", "-s", f"{D}/aln.fasta",
                "-q", f"{D}/query.fasta", "-m", MODEL]
    if name == "dna_noheur":
        return ["-t", f"{D}/ref.tre", "-s", f"{D}/aln.fasta",
                "-q", f"{D}/query.fasta", "-m", MODEL, "--no-heur"]
    if name == "dna_rooted":
        return ["-t", f"{D}/ref_rooted.tre", "-s", f"{D}/aln.fasta",
                "-q", f"{D}/query.fasta", "-m", MODEL]
    if name == "aa_lg":
        tree_file = os.path.join(workdir, "aa.tre")
        with open(tree_file, "w") as f:
            f.write(AA_TREE + "\n")
        return ["-t", tree_file, "-s", f"{D}/AA_aln.fasta",
                "-q", f"{D}/AA_query.fasta", "-m", "LG+G4{0.75}"]
    if name == "dna_baseball_prec4":
        # baseball heuristic + non-default output precision
        return ["-t", f"{D}/ref.tre", "-s", f"{D}/aln.fasta",
                "-q", f"{D}/query.fasta", "-m", MODEL,
                "--baseball-heur", "--precision", "4"]
    if name == "dna_fixheur_filters":
        # fixed top-x% heuristic + min-LWR filter with wider clamps
        return ["-t", f"{D}/ref.tre", "-s", f"{D}/aln.fasta",
                "-q", f"{D}/query.fasta", "-m", MODEL,
                "-G", "0.5", "--filter-min-lwr", "0.001",
                "--filter-min", "2", "--filter-max", "10"]
    raise KeyError(name)


def run_config(name: str, outdir: str) -> str:
    rc = main(config_args(name, outdir) + ["-w", outdir + "/", "--redo"])
    assert rc == 0, name
    return os.path.join(outdir, "epa_result.jplace")


def canon(text: str) -> str:
    """Golden-comparable form: the invocation metadata embeds absolute
    temp paths, everything else must match byte for byte."""
    return "\n".join(l for l in text.splitlines()
                     if '"invocation"' not in l)


@pytest.mark.parametrize("name", CONFIGS)
def test_golden_jplace(name, tmp_path):
    golden_path = os.path.join(GOLDEN_DIR, f"{name}.jplace")
    assert os.path.exists(golden_path), (
        f"missing golden {golden_path}; run python tools/make_goldens.py")
    out = run_config(name, str(tmp_path))
    got = canon(open(out).read())
    want = canon(open(golden_path).read())
    assert got == want, (
        f"serialized jplace changed for {name!r}. If intended, regenerate "
        "with python tools/make_goldens.py and review the diff.")
    json.loads(open(out).read())  # and it stays valid JSON


def _pendant_edge_num(tree_string: str, label: str) -> int:
    m = re.search(re.escape(label) + r":[0-9.eE+-]+\{(\d+)\}", tree_string)
    assert m, f"{label} not found in tree string"
    return int(m.group(1))


def _closest_ref_label(qseq: str, refs: dict) -> str:
    def sim(a, b):
        n = d = 0
        for x, y in zip(a, b):
            if x in "-N?" or y in "-N?":
                continue
            n += 1
            d += x == y
        return d / max(n, 1)
    return max(refs, key=lambda r: sim(qseq, refs[r]))


def test_top_edges_concordant_with_raxml_epa(tmp_path):
    """Loose anchor against the reference repo's RAxML-EPA artifact
    (test/data/raxml_output.jplace): both tools place each query on the
    pendant edge of its nearest reference taxon. The repo's aln.fasta is
    an ANONYMIZED (A..H, shuffled) version of raxml's animal-named data,
    so the taxon correspondence is recovered by sequence identity: Rat's
    closest reference row is Mouse's sequence, Carp's is Loach's. RAxML
    used its own branch lengths/model fit, so only the top EDGE is
    compared, not numbers."""
    from epa_ng_tpu.io import fasta as fio
    raxml = json.load(open(f"{D}/raxml_output.jplace"))
    raxml_best = {tuple(p["n"])[0]: p["p"][0][0]
                  for p in raxml["placements"]}
    # raxml placed each query on its nearest taxon's pendant edge
    assert raxml_best["Rat"] == _pendant_edge_num(raxml["tree"], "Mouse")
    assert raxml_best["Carp"] == _pendant_edge_num(raxml["tree"], "Loach")

    refs = {s.header: s.sequence
            for s in fio.build_msa_from_file(
                f"{D}/aln.fasta", fio.make_msa_info(f"{D}/aln.fasta"),
                premask=False)}
    qrys = {s.header: s.sequence
            for s in fio.build_msa_from_file(
                f"{D}/query.fasta", fio.make_msa_info(f"{D}/query.fasta"),
                premask=False)}

    out = run_config("dna_heur", str(tmp_path))
    ours = json.load(open(out))
    best = {tuple(p["n"])[0]: max(p["p"], key=lambda r: r[2])[0]
            for p in ours["placements"]}
    for q in ("Rat", "Carp"):
        want_label = _closest_ref_label(qrys[q], refs)
        assert best[q] == _pendant_edge_num(ours["tree"], want_label), q
