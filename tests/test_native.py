"""Native fastseq scanner: equality against the pure-python reader."""

import numpy as np
import pytest

from epa_ng_tpu.io import fasta as fio
from epa_ng_tpu.io.native import NativeChunkReader, get_lib, native_info
from epa_ng_tpu.models.charmaps import NT_LOOKUP_COL, encode_lookup_cols

D = "/root/reference/test/data"

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native fastseq unavailable")


def test_native_info_matches_python():
    for f in ["aln.fasta", "query.fasta", "combined.fasta"]:
        got = native_info(f"{D}/{f}")
        assert got is not None
        want = fio.make_msa_info(f"{D}/{f}")
        assert got[0] == want.sequences
        assert got[1] == want.sites
        assert (got[2] == want.gap_mask).all()


def test_native_chunks_match_python():
    info = fio.make_msa_info(f"{D}/aln.fasta")
    r = NativeChunkReader(f"{D}/aln.fasta", NT_LOOKUP_COL, info.sites)
    all_labels = []
    all_codes = []
    while True:
        labels, codes = r.read_chunk(3)
        if labels is None:
            break
        all_labels.extend(labels)
        all_codes.append(codes)
    codes = np.concatenate(all_codes)
    msa = fio.build_msa_from_file(f"{D}/aln.fasta", info, premask=False)
    assert all_labels == [s.header for s in msa]
    for i, s in enumerate(msa):
        want = encode_lookup_cols(s.sequence, 4)
        assert (codes[i] == want).all(), s.header


def test_native_premask_and_skip():
    info = fio.make_msa_info(f"{D}/query.fasta")
    mask = np.zeros(info.sites, dtype=bool)
    mask[:10] = True  # drop the first 10 columns
    r = NativeChunkReader(f"{D}/query.fasta", NT_LOOKUP_COL, info.sites,
                          mask=mask, skip=1)
    labels, codes = r.read_chunk(10)
    assert labels == ["Carp"]
    assert codes.shape == (1, info.sites - 10)
    msa = fio.build_msa_from_file(f"{D}/query.fasta", info, premask=False)
    want = encode_lookup_cols(msa[1].sequence[10:], 4)
    assert (codes[0] == want).all()


def test_native_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.fasta"
    bad.write_text(">a\nAC!GT\n")
    r = NativeChunkReader(str(bad), NT_LOOKUP_COL, 5)
    with pytest.raises(ValueError, match="invalid character"):
        r.read_chunk(1)


def test_native_msa_stream_matches_python():
    from epa_ng_tpu.io.native import NativeMSAStream
    for premask in (False, True):
        info = fio.make_msa_info(f"{D}/query.fasta")
        ref_info = fio.make_msa_info(f"{D}/aln.fasta")
        if premask:
            fio.MSAInfo.or_mask(ref_info, info)
        a = NativeMSAStream(f"{D}/query.fasta", info, premask)
        b = fio.MSAStream(f"{D}/query.fasta", info, premask)
        while True:
            ca = a.read_next(1)
            cb = b.read_next(1)
            assert len(ca) == len(cb)
            if not len(ca):
                break
            assert ca[0].header == cb[0].header
            assert ca[0].sequence == cb[0].sequence


def test_native_msa_stream_sharding():
    info = fio.make_msa_info(f"{D}/query.fasta")
    from epa_ng_tpu.io.native import NativeMSAStream
    seen = []
    for rank in range(2):
        r = NativeMSAStream(f"{D}/query.fasta", info, True, split=True,
                            process_index=rank, process_count=2)
        chunk = r.read_next(100)
        seen.extend(s.header for s in chunk)
    full = fio.MSAStream(f"{D}/query.fasta", info, True).read_next(100)
    assert seen == [s.header for s in full]


def test_reader_factory_uses_native():
    from epa_ng_tpu.io.native import NativeMSAStream, get_lib
    info = fio.make_msa_info(f"{D}/query.fasta")
    r = fio.make_msa_reader(f"{D}/query.fasta", info, True, split=False)
    if get_lib() is not None:
        assert isinstance(r, NativeMSAStream)
