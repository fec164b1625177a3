"""CLI driver tests: modes, mutual exclusions, output artifacts."""

import json
import os

import pytest

from epa_ng_tpu.cli import build_parser, main, options_from_args

D = "/root/reference/test/data"


def run(argv):
    return main(argv)


def test_version(capsys):
    assert run(["--version"]) == 0
    assert "epa-ng-tpu v" in capsys.readouterr().out


def test_mutual_exclusions():
    with pytest.raises(SystemExit):
        options_from_args(build_parser().parse_args(
            ["--no-heur", "-g", "0.9"]))
    with pytest.raises(SystemExit):
        options_from_args(build_parser().parse_args(
            ["--filter-acc-lwr", "0.9", "--filter-min-lwr", "0.1"]))
    with pytest.raises(SystemExit):
        options_from_args(build_parser().parse_args(
            ["--filter-min", "5", "--filter-max", "2"]))
    with pytest.raises(SystemExit):
        options_from_args(build_parser().parse_args(
            ["-b", "x.npz", "-t", "y.tre"]))


def test_options_mapping():
    o = options_from_args(build_parser().parse_args(
        ["-G", "0.2", "--raxml-blo", "--no-pre-mask", "--chunk-size", "77",
         "--filter-acc-lwr", "0.95", "--preserve-rooting", "off"]))
    assert o.prescoring_by_percentage and o.prescoring_threshold == 0.2
    assert not o.sliding_blo
    assert not o.premasking
    assert o.chunk_size == 77
    assert o.acc_threshold and o.support_threshold == 0.95
    assert not o.preserve_rooting


def test_full_place_run(tmp_path):
    out = str(tmp_path) + "/"
    rc = run(["-t", f"{D}/ref.tre", "-s", f"{D}/aln.fasta",
              "-q", f"{D}/query.fasta", "-m", "GTR+G",
              "-w", out, "--redo", "--blo-block", "64"])
    assert rc == 0
    doc = json.load(open(out + "epa_result.jplace"))
    assert doc["version"] == 3
    assert doc["fields"][0] == "edge_num"
    names = sorted(p["n"][0] for p in doc["placements"])
    assert names == ["Carp", "Rat"]
    assert os.path.exists(out + "epa_info.log")
    # redo protection
    with pytest.raises(RuntimeError, match="--redo"):
        run(["-t", f"{D}/ref.tre", "-s", f"{D}/aln.fasta",
             "-q", f"{D}/query.fasta", "-m", "GTR+G", "-w", out])


def test_model_file_input(tmp_path):
    out = str(tmp_path) + "/"
    rc = run(["-t", f"{D}/ref.tre", "-s", f"{D}/aln.fasta",
              "-q", f"{D}/query.fasta", "-m", f"{D}/modelfiles/raxng_dna",
              "-w", out, "--redo", "--blo-block", "64"])
    assert rc == 0
    doc = json.load(open(out + "epa_result.jplace"))
    assert len(doc["placements"]) == 2


def test_binary_roundtrip(tmp_path):
    out = str(tmp_path) + "/"
    assert run(["-t", f"{D}/ref.tre", "-s", f"{D}/aln.fasta", "-m", "GTR+G",
                "-B", "-w", out, "--redo"]) == 0
    assert run(["-b", out + "epa_binary_file.npz", "-q", f"{D}/query.fasta",
                "-w", out, "--redo", "--blo-block", "64"]) == 0
    doc = json.load(open(out + "epa_result.jplace"))
    assert len(doc["placements"]) == 2


def test_split_mode(tmp_path):
    out = str(tmp_path) + "/"
    assert run(["--split", f"{D}/aln.fasta", f"{D}/combined.fasta",
                "-w", out]) == 0
    from epa_ng_tpu.io.fasta import iter_fasta
    q = [l for l, _ in iter_fasta(out + "query.fasta")]
    r = [l for l, _ in iter_fasta(out + "reference.fasta")]
    assert len(r) == 8
    assert set(q).isdisjoint(r)


def test_bfast_convert_and_place(tmp_path):
    out = str(tmp_path) + "/"
    assert run(["-c", f"{D}/query.fasta", "-w", out]) == 0
    bfast_file = out + "query.fasta.bfast"
    assert os.path.exists(bfast_file)
    rc = run(["-t", f"{D}/ref.tre", "-s", f"{D}/aln.fasta",
              "-q", bfast_file, "-m", "GTR+G",
              "-w", out, "--redo", "--blo-block", "64"])
    assert rc == 0
    doc = json.load(open(out + "epa_result.jplace"))
    assert sorted(p["n"][0] for p in doc["placements"]) == ["Carp", "Rat"]


def test_collapsed_duplicates_emit_all_names(tmp_path):
    """Duplicate query reads are placed once and every name appears in
    the jplace output (reference: src/set_manipulators.cpp:208-226)."""
    src = open(f"{D}/query.fasta").read()
    recs = [r for r in src.strip().split(">") if r.strip()]
    lines_out = []
    for r in recs:
        lines = r.strip().split("\n")
        lines_out.append(">" + lines[0] + "\n" + "\n".join(lines[1:]))
        lines_out.append(">" + lines[0] + "_dup\n" + "\n".join(lines[1:]))
    qpath = tmp_path / "qdup.fasta"
    qpath.write_text("\n".join(lines_out) + "\n")

    out = str(tmp_path) + "/"
    rc = run(["-t", f"{D}/ref.tre", "-s", f"{D}/aln.fasta",
              "-q", str(qpath), "-m", "GTR+G", "-w", out, "--redo"])
    assert rc == 0
    doc = json.load(open(out + "epa_result.jplace"))
    names = {tuple(p["n"]) for p in doc["placements"]}
    assert ("Rat", "Rat_dup") in names
    assert ("Carp", "Carp_dup") in names
