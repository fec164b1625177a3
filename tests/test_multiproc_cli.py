"""Simulated multi-host CLI run: two ranks place disjoint query shards and
rank 0 merges the jplace fragments — the analog of the reference's MPI data
parallelism + MPI-IO collective output (src/net/epa_mpi_util.cpp:10-30,
src/io/jplace_writer.hpp:92-132), driven via the EPA_NG_TPU_PROCESS_* env
overrides."""

import json
import os

import pytest

from epa_ng_tpu.cli import main

D = "/root/reference/test/data"
MODEL = "GTR{1.1/2.9/0.8/1.2/3.4/1}+FU{0.27/0.23/0.24/0.26}+G4{0.6}"


def _run_rank(outdir, rank, count, redo=True):
    os.environ["EPA_NG_TPU_PROCESS_INDEX"] = str(rank)
    os.environ["EPA_NG_TPU_PROCESS_COUNT"] = str(count)
    try:
        rc = main(["-t", f"{D}/ref.tre", "-s", f"{D}/aln.fasta",
                   "-q", f"{D}/query.fasta", "-m", MODEL,
                   "-w", str(outdir) + "/"] + (["--redo"] if redo else []))
    finally:
        del os.environ["EPA_NG_TPU_PROCESS_INDEX"]
        del os.environ["EPA_NG_TPU_PROCESS_COUNT"]
    assert rc == 0


def test_two_rank_merge_equals_single(tmp_path):
    single = tmp_path / "single"
    multi = tmp_path / "multi"
    single.mkdir()
    multi.mkdir()

    rc = main(["-t", f"{D}/ref.tre", "-s", f"{D}/aln.fasta",
               "-q", f"{D}/query.fasta", "-m", MODEL,
               "-w", str(single) + "/", "--redo"])
    assert rc == 0

    # rank 1 first so its shard exists when rank 0 merges (real runs order
    # this with the cross-host barrier)
    _run_rank(multi, 1, 2)
    _run_rank(multi, 0, 2)

    a = json.load(open(single / "epa_result.jplace"))
    b = json.load(open(multi / "epa_result.jplace"))
    assert not os.path.exists(multi / "epa_result.jplace.shard0")
    assert not os.path.exists(multi / "epa_result.jplace.shard1")
    assert a["tree"] == b["tree"]
    pa = {tuple(p["n"]): p["p"] for p in a["placements"]}
    pb = {tuple(p["n"]): p["p"] for p in b["placements"]}
    assert pa.keys() == pb.keys()
    for k in pa:
        assert len(pa[k]) == len(pb[k])
        for ra, rb in zip(pa[k], pb[k]):
            assert ra == pytest.approx(rb, abs=1e-9)


def test_two_rank_per_rank_logs_without_redo(tmp_path, capsys):
    """Each rank must write its own N.epa_info.log (reference:
    src/main.cpp:309-313) — WITHOUT --redo, so a regression where every
    rank opens the same epa_info.log trips the overwrite guard."""
    multi = tmp_path / "fresh"
    multi.mkdir()
    _run_rank(multi, 1, 2, redo=False)
    _run_rank(multi, 0, 2, redo=False)
    assert (multi / "0.epa_info.log").exists()
    assert (multi / "1.epa_info.log").exists()
    assert not (multi / "epa_info.log").exists()
    doc = json.load(open(multi / "epa_result.jplace"))
    assert len(doc["placements"]) == 2


def test_rank1_logs_nothing_to_stdout(tmp_path, capsys):
    multi = tmp_path / "quiet"
    multi.mkdir()
    capsys.readouterr()
    _run_rank(multi, 1, 2)
    out = capsys.readouterr().out
    assert "Sequences done" not in out
    log1 = open(multi / "1.epa_info.log").read()
    assert "Sequences done" in log1


def test_bad_distributed_spec():
    from epa_ng_tpu.cli import maybe_init_distributed
    with pytest.raises(SystemExit, match="bad --distributed spec"):
        maybe_init_distributed("nonsense-without-commas")
