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


def test_merge_raises_on_missing_shard(tmp_path):
    """A rank that never wrote its shard (died / wrong --tmp) must abort
    the merge, not yield a valid-looking partial document (reference: the
    MPI-IO collective write can't silently lose a rank,
    src/io/jplace_writer.hpp:92-132)."""
    from epa_ng_tpu.parallel.dist import merge_jplace_shards
    (tmp_path / "epa_result.jplace.shard0").write_text(
        '    {"p": [\n      [0, -1.0, 1.0, 0.1, 0.1]\n      ],\n'
        '    "n": ["q1"]\n    }')
    with pytest.raises(RuntimeError, match=r"missing shard\(s\) \[1\]"):
        merge_jplace_shards(str(tmp_path), "epa_result.jplace", 2,
                            "(a,b);", "inv")
    assert not (tmp_path / "epa_result.jplace").exists() or \
        "placements" not in (tmp_path / "epa_result.jplace").read_text()


def test_merge_raises_on_truncated_shard(tmp_path):
    """A shard whose .count sidecar disagrees with its content (crashed
    mid-write) must abort the merge."""
    from epa_ng_tpu.parallel.dist import merge_jplace_shards
    frag = ('    {"p": [\n      [0, -1.0, 1.0, 0.1, 0.1]\n      ],\n'
            '    "n": ["q1"]\n    }')
    (tmp_path / "epa_result.jplace.shard0").write_text(frag)
    (tmp_path / "epa_result.jplace.shard0.count").write_text("2")
    with pytest.raises(RuntimeError, match="truncated"):
        merge_jplace_shards(str(tmp_path), "epa_result.jplace", 1,
                            "(a,b);", "inv")


def test_result_overwrite_guard(tmp_path):
    """epa_result.jplace itself is --redo-guarded, independent of the log
    file (reference: src/main.cpp:315-320)."""
    out = tmp_path / "guard"
    out.mkdir()
    rc = main(["-t", f"{D}/ref.tre", "-s", f"{D}/aln.fasta",
               "-q", f"{D}/query.fasta", "-m", MODEL,
               "-w", str(out) + "/"])
    assert rc == 0
    before = (out / "epa_result.jplace").read_text()
    # delete the log but keep the result: rerun without --redo must fail
    (out / "epa_info.log").unlink()
    rc = main(["-t", f"{D}/ref.tre", "-s", f"{D}/aln.fasta",
               "-q", f"{D}/query.fasta", "-m", MODEL,
               "-w", str(out) + "/"])
    assert rc == 1
    assert (out / "epa_result.jplace").read_text() == before


def test_adaptive_split_two_ranks(tmp_path):
    """--adaptive-split: rate-proportional query shards (the runtime
    consumer of the difficulty-proportional scheduler math,
    parallel.schedule.proportional_shares). Forced 3:1 rates give rank 0
    three quarters of the queries; the merged document must equal the
    single-rank run exactly (shards stay contiguous and ordered)."""
    from epa_ng_tpu.utils.synth import synth_files

    data = tmp_path / "data"
    data.mkdir()
    tpath, rpath, qpath = synth_files(str(data), n_taxa=12, sites=96,
                                      n_queries=16, seed=33)
    single = tmp_path / "single"
    multi = tmp_path / "multi"
    single.mkdir()
    multi.mkdir()
    base = ["-t", tpath, "-s", rpath, "-q", qpath, "-m", MODEL, "--redo"]
    assert main(base + ["-w", str(single) + "/"]) == 0

    os.environ["EPA_NG_TPU_CALIBRATION_RATES"] = "3,1"
    try:
        for rank in (1, 0):
            os.environ["EPA_NG_TPU_PROCESS_INDEX"] = str(rank)
            os.environ["EPA_NG_TPU_PROCESS_COUNT"] = "2"
            try:
                rc = main(base + ["-w", str(multi) + "/",
                                  "--adaptive-split"])
            finally:
                del os.environ["EPA_NG_TPU_PROCESS_INDEX"]
                del os.environ["EPA_NG_TPU_PROCESS_COUNT"]
            assert rc == 0
    finally:
        del os.environ["EPA_NG_TPU_CALIBRATION_RATES"]

    a = json.load(open(single / "epa_result.jplace"))
    b = json.load(open(multi / "epa_result.jplace"))
    # contiguous rate-proportional shards preserve input order: documents
    # match pquery by pquery
    na = [tuple(p["n"]) for p in a["placements"]]
    nb = [tuple(p["n"]) for p in b["placements"]]
    assert na == nb and len(na) == 16
    # the 3:1 split put 12 queries on rank 0 (check via the rank logs)
    log0 = open(multi / "0.epa_info.log").read()
    assert "offset 0, 12 queries" in log0, log0[-500:]


def test_proportional_shares_math():
    from epa_ng_tpu.parallel.schedule import proportional_shares
    # exact sum, contiguity, proportionality
    sh = proportional_shares(100, [3.0, 1.0])
    assert sh == [(0, 75), (75, 25)]
    sh = proportional_shares(10, [1, 1, 1])
    assert sum(c for _, c in sh) == 10
    assert sh[0][0] == 0 and all(
        sh[i][0] == sh[i - 1][0] + sh[i - 1][1] for i in range(1, 3))
    # zero/degenerate rates fall back to even
    assert proportional_shares(8, [0.0, 0.0]) == [(0, 4), (4, 4)]
    # a very slow rank may get zero queries; totals still exact
    sh = proportional_shares(2, [100.0, 0.001])
    assert sh == [(0, 2), (2, 0)]


def test_bad_distributed_spec():
    from epa_ng_tpu.cli import maybe_init_distributed
    with pytest.raises(SystemExit, match="bad --distributed spec"):
        maybe_init_distributed("nonsense-without-commas")


def test_real_jax_distributed_two_procs(tmp_path):
    """End-to-end jax.distributed smoke test: two REAL processes init via
    --distributed coordinator,2,rank (TCP on localhost, CPU backend),
    exercising maybe_init_distributed, the cross-host barrier and the
    rank-0 shard merge — the env-override path above never touches the
    real init (reference analog: src/net/epa_mpi_util.cpp:10-30)."""
    import json as _json
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = {k: v for k, v in os.environ.items()
           if not k.startswith("EPA_NG_TPU_PROCESS")}
    env["JAX_PLATFORMS"] = "cpu"
    outdir = tmp_path / "dist"
    outdir.mkdir()
    procs = []
    for rank in (0, 1):
        procs.append(subprocess.Popen(
            [_sys.executable, "-m", "epa_ng_tpu.cli",
             "-t", f"{D}/ref.tre", "-s", f"{D}/aln.fasta",
             "-q", f"{D}/query.fasta", "-m", MODEL,
             "-w", str(outdir) + "/", "--redo",
             "--distributed", f"{coord},2,{rank}"],
            env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    doc = _json.load(open(outdir / "epa_result.jplace"))
    names = sorted(tuple(p["n"])[0] for p in doc["placements"])
    assert names == ["Carp", "Rat"]
    assert (outdir / "0.epa_info.log").exists()
    assert (outdir / "1.epa_info.log").exists()


def test_merge_raises_on_missing_sidecar(tmp_path):
    """A shard without its .count sidecar (rank died before closing its
    writer) is unverifiable -> merge refuses; and the failed merge leaves
    NO partial document at the result path (atomic temp+rename)."""
    from epa_ng_tpu.parallel.dist import merge_jplace_shards
    frag = ('    {"p": [\n      [0, -1.0, 1.0, 0.1, 0.1]\n      ],\n'
            '    "n": ["q1"]\n    }')
    (tmp_path / "epa_result.jplace.shard0").write_text(frag)
    with pytest.raises(RuntimeError, match="sidecar"):
        merge_jplace_shards(str(tmp_path), "epa_result.jplace", 1,
                            "(a,b);", "inv")
    assert not (tmp_path / "epa_result.jplace").exists()
    assert not (tmp_path / "epa_result.jplace.merging").exists()


def test_two_rank_with_local_mesh(tmp_path):
    """--mesh composes with multi-host query sharding: two ranks, each
    running its shard over a local 2x2 device mesh, merge to the same
    document as a plain single run."""
    import subprocess
    import sys as _sys

    outdir = tmp_path / "meshdist"
    outdir.mkdir()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=4").strip()
    # rank 1 first, then rank 0 (the env-override mode has no real
    # barrier, and rank 0's merge requires rank 1's shard to exist —
    # real runs synchronize via jax.distributed)
    for rank in (1, 0):
        e = dict(env)
        e["EPA_NG_TPU_PROCESS_INDEX"] = str(rank)
        e["EPA_NG_TPU_PROCESS_COUNT"] = "2"
        p = subprocess.run(
            [_sys.executable, "-m", "epa_ng_tpu.cli",
             "-t", f"{D}/ref.tre", "-s", f"{D}/aln.fasta",
             "-q", f"{D}/query.fasta", "-m", MODEL,
             "-w", str(outdir) + "/", "--redo", "--mesh", "2x2"],
            env=e, cwd="/root/repo", timeout=540,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        assert p.returncode == 0, p.stdout.decode()[-3000:]

    single = tmp_path / "single"
    single.mkdir()
    assert main(["-t", f"{D}/ref.tre", "-s", f"{D}/aln.fasta",
                 "-q", f"{D}/query.fasta", "-m", MODEL,
                 "-w", str(single) + "/", "--redo"]) == 0
    a = json.load(open(single / "epa_result.jplace"))
    b = json.load(open(outdir / "epa_result.jplace"))
    pa = {tuple(p["n"]): p["p"] for p in a["placements"]}
    pb = {tuple(p["n"]): p["p"] for p in b["placements"]}
    assert pa.keys() == pb.keys()
    for k in pa:
        for ra, rb in zip(pa[k], pb[k]):
            assert ra == pytest.approx(rb, abs=1e-9)
