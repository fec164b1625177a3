"""Sequence IO tests: FASTA/phylip readers, MSA info, bfast round-trips.

The bfast format is byte-compatible with the reference's Binary_Fasta
(src/io/Binary_Fasta.hpp); test/data/query.fasta.bin is a file written by the
reference implementation and must decode to exactly query.fasta's contents.
"""

import numpy as np

from epa_ng_tpu.io import bfast
from epa_ng_tpu.io import fasta as fio

D = "/root/reference/test/data"


def test_fasta_reader():
    msa = fio.build_msa_from_file(f"{D}/aln.fasta",
                                  fio.make_msa_info(f"{D}/aln.fasta"),
                                  premask=False)
    assert len(msa) == 8
    assert [s.header for s in msa] == list("ABCDEFGH")
    assert msa.num_sites == 705
    assert set(msa[0].sequence) <= set("ACGTN-")


def test_phylip_reader():
    msa = fio.build_msa_from_file(f"{D}/aln.phy",
                                  fio.make_msa_info(f"{D}/aln.phy"),
                                  premask=False)
    assert len(msa) == 10  # combined ref + query alignment
    assert msa.num_sites == 705


def test_msa_info_or_mask():
    ref = fio.make_msa_info(f"{D}/aln.fasta")
    qry = fio.make_msa_info(f"{D}/query.fasta")
    assert ref.sites == qry.sites
    combined = fio.MSAInfo.or_mask(ref, qry)
    assert combined.dtype == bool
    assert (ref.gap_mask == qry.gap_mask).all()


def test_reference_bfast_file_decodes():
    """query.fasta.bin was produced by the reference binary."""
    if not bfast.is_bfast(f"{D}/query.fasta.bin"):
        import pytest
        pytest.skip("reference bfast file missing")
    got = bfast.load(f"{D}/query.fasta.bin", premask=False)
    want = fio.build_msa_from_file(f"{D}/query.fasta",
                                   fio.make_msa_info(f"{D}/query.fasta"),
                                   premask=False)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.header == w.header
        assert g.sequence == w.sequence.upper()


def test_bfast_roundtrip(tmp_path):
    out = bfast.fasta_to_bfast(f"{D}/query.fasta", str(tmp_path))
    assert bfast.is_bfast(out)
    info = bfast.get_info(out)
    finfo = fio.make_msa_info(f"{D}/query.fasta")
    assert info.sequences == finfo.sequences
    assert info.sites == finfo.sites
    got = bfast.load(out)
    want = fio.build_msa_from_file(f"{D}/query.fasta", finfo, premask=False)
    for g, w in zip(got, want):
        assert g.header == w.header
        assert g.sequence == w.sequence


def test_bfast_reader_chunks_match_stream(tmp_path):
    out = bfast.fasta_to_bfast(f"{D}/aln.fasta", str(tmp_path))
    info = bfast.get_info(out)
    r = fio.make_msa_reader(out, info, premask=False, split=False)
    assert isinstance(r, bfast.BfastReader)
    chunk1 = r.read_next(3)
    chunk2 = r.read_next(100)
    assert len(chunk1) == 3
    assert len(chunk2) == 5
    assert chunk1[0].header == "A"
    assert chunk2[0].header == "D"


def _encoded_equals_string_path(path, info, premask: bool):
    """read_next_encoded must equal encode(read_next) chunk by chunk."""
    from epa_ng_tpu.core import chunk as chunk_mod
    ra = bfast.BfastReader(path, info, premask=premask)
    rb = bfast.BfastReader(path, info, premask=premask)
    while True:
        ec = ra.read_next_encoded(3, num_states=4)
        msa = rb.read_next(3)
        if ec is None:
            assert len(msa) == 0
            break
        want = chunk_mod.from_msa(msa, 4)
        assert [h[0] for h in ec.headers] == [h[0] for h in want.headers]
        assert (ec.codes == want.codes).all()
        assert (ec.ranges == want.ranges).all()


def test_bfast_encoded_reader_matches_string_path(tmp_path):
    out = bfast.fasta_to_bfast(f"{D}/query.fasta", str(tmp_path))
    info = bfast.get_info(out)
    _encoded_equals_string_path(out, info, premask=False)
    _encoded_equals_string_path(out, info, premask=True)


def test_bfast_encoded_reader_legacy_file():
    if not bfast.is_bfast(f"{D}/query.fasta.bin"):
        import pytest
        pytest.skip("reference bfast file missing")
    info = bfast.get_info(f"{D}/query.fasta.bin")
    _encoded_equals_string_path(f"{D}/query.fasta.bin", info, premask=False)


def test_bfast_encoded_reader_sharded(tmp_path):
    out = bfast.fasta_to_bfast(f"{D}/aln.fasta", str(tmp_path))
    info = bfast.get_info(out)
    from epa_ng_tpu.core import chunk as chunk_mod
    for rank in range(3):
        r = bfast.BfastReader(out, info, premask=False, split=True,
                              process_index=rank, process_count=3)
        s = bfast.BfastReader(out, info, premask=False, split=True,
                              process_index=rank, process_count=3)
        ec = r.read_next_encoded(100, num_states=4)
        want = chunk_mod.from_msa(s.read_next(100), 4)
        assert (ec.codes == want.codes).all()
        assert [h[0] for h in ec.headers] == [h[0] for h in want.headers]


def test_stream_sharding():
    info = fio.make_msa_info(f"{D}/aln.fasta")
    headers = []
    for rank in range(3):
        r = fio.MSAStream(f"{D}/aln.fasta", info, premask=False, split=True,
                          process_index=rank, process_count=3)
        chunk = r.read_next(100)
        headers.extend(s.header for s in chunk)
    assert headers == list("ABCDEFGH")


def test_fourbit_padding():
    for seq in ("ACG", "ACGT", "A", "ACGTN-RY"):
        assert bfast.unpack_fourbit(bfast.pack_fourbit(seq), len(seq)) == seq


def test_collapse_equal_sequences():
    msa = fio.MSA()
    msa.append("a", "ACGT")
    msa.append("b", "ACGG")
    msa.append("c", "ACGT")
    out = fio.find_collapse_equal_sequences(msa)
    assert len(out) == 2
    assert out[0].headers == ["a", "c"]


def test_valid_range():
    from epa_ng_tpu.utils.ranges import get_valid_range
    begin, span = get_valid_range("---ATAGCT--")
    assert (begin, span) == (3, 6)
    begin, span = get_valid_range("ATAGCT")
    assert (begin, span) == (0, 6)
    begin, span = get_valid_range("----")
    assert span == 0


def test_gzipped_fasta(tmp_path):
    """Gzipped sequence files read transparently (the reference reads
    gzipped fasta via genesis' input streams)."""
    import gzip
    src = open("/root/reference/test/data/aln.fasta", "rb").read()
    gz = tmp_path / "aln.fasta.gz"
    gz.write_bytes(gzip.compress(src))
    want = fio.make_msa_info("/root/reference/test/data/aln.fasta")
    got = fio.make_msa_info(str(gz))
    assert got.sequences == want.sequences
    assert got.sites == want.sites
    assert (got.gap_mask == want.gap_mask).all()
    a = fio.build_msa_from_file("/root/reference/test/data/aln.fasta",
                                want, False)
    b = fio.build_msa_from_file(str(gz), got, False)
    assert [s.sequence for s in a] == [s.sequence for s in b]


def test_fasta_record_offset_scan():
    from epa_ng_tpu.io.fasta import fasta_record_offset, iter_fasta
    path = f"{D}/query.fasta"
    recs = list(iter_fasta(path))
    for skip in range(len(recs) + 2):
        off = fasta_record_offset(path, skip)
        rest = list(iter_fasta(path, start_offset=off))
        assert rest == recs[skip:], skip


def test_msastream_shard_skip_matches_sequential(tmp_path):
    from epa_ng_tpu.io.fasta import MSAStream, make_msa_info
    p = tmp_path / "many.fasta"
    with open(p, "w") as f:
        for i in range(23):
            f.write(f">s{i}\nACGT{'AC' * (i % 3)}ACGT\n"
                    .replace("ACGTACGT", "ACGTACGT"))
    # equal widths required: rewrite with fixed width
    with open(p, "w") as f:
        for i in range(23):
            f.write(f">s{i}\nACGTACGT\n")
    info = make_msa_info(str(p))
    whole = MSAStream(str(p), info, premask=False).read_next(100)
    for count in (2, 3, 5):
        got = []
        for rank in range(count):
            s = MSAStream(str(p), info, premask=False, split=True,
                          process_index=rank, process_count=count)
            chunk = s.read_next(100)
            got.extend((q.header, q.sequence) for q in chunk)
        assert got == [(q.header, q.sequence) for q in whole]


def _genesis_gap_mask(path):
    """Independent oracle for the premask rule: genesis gap_sites with its
    default nucleic_acid_codes_undetermined() == "NOX.-?" set, matched
    case-insensitively over RAW (non-uppercased) characters — what the
    reference's MSA_Info prepass computes (src/seq/MSA_Info.hpp:22-59)."""
    gap = set("NOX.-?nox")
    mask = None
    for _, seq in fio.iter_any_seqfile(path):
        cur = np.array([c in gap for c in seq])
        mask = cur if mask is None else (mask & cur)
    return mask


def test_gap_mask_matches_genesis_rule():
    """Pins GAP_CHARS to the genesis undetermined set: the mask the repo
    computes on reference test data equals the genesis-rule oracle."""
    for name in ("aln.fasta", "query.fasta", "range_combined.fasta"):
        info = fio.make_msa_info(f"{D}/{name}")
        want = _genesis_gap_mask(f"{D}/{name}")
        assert (info.gap_mask == want).all(), name


def test_all_N_column_is_premasked(tmp_path):
    """An all-N column counts as all-gap, like the reference (genesis
    treats N/O/X as undetermined); a column with any real base does not."""
    p = tmp_path / "n.fasta"
    p.write_text(">a\nAN-NC\n>b\nGN-xA\n>c\nTn-oT\n")
    info = fio.make_msa_info(str(p))
    assert info.gap_mask.tolist() == [False, True, True, True, False]
    msa = fio.build_msa_from_file(str(p), info, premask=True)
    assert msa[0].sequence == "AC"


def test_native_and_python_masks_agree(tmp_path):
    """The C++ mmap scanner and the python fallback implement the same
    gap rule (incl. lowercase n/o/x on raw bytes)."""
    from epa_ng_tpu.io.native import native_info
    p = tmp_path / "mix.fasta"
    p.write_text(">a\nANoX.-?CgT\n>b\nGnOx.-?cGa\n")
    got = native_info(str(p))
    if got is None:
        import pytest
        pytest.skip("native scanner unavailable")
    n_seqs, n_sites, mask = got
    info_py = fio.MSAInfo(path=str(p), sites=n_sites, sequences=n_seqs,
                          gap_mask=mask)
    want = _genesis_gap_mask(str(p))
    assert (info_py.gap_mask == want).all()
    assert n_seqs == 2 and n_sites == 10
