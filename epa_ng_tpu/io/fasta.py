"""FASTA / phylip sequence IO, MSA container, premasking info.

Mirrors the reference's seq layer (src/seq/MSA.hpp, src/seq/MSA_Info.hpp,
src/seq/MSA_Stream.cpp): streaming chunked reads, uppercasing, per-site
all-gap masks, and pplacer-style combined premasking (drop sites that are
gap in *either* the reference or the query alignment).
"""

from __future__ import annotations

import io
import os
from dataclasses import dataclass, field
from typing import Iterator, Optional

import numpy as np

# Characters treated as gaps when building all-gap column masks. The
# reference delegates to genesis' gap_sites with its default gap set —
# nucleic_acid_codes_undetermined() == "NOX.-?", matched case-insensitively
# (src/seq/MSA_Info.hpp:53) — for BOTH DNA and AA files, so e.g. an all-N
# column is premasked exactly like an all-'-' column. We match that rule
# (sequences are uppercased before masking, so the upper-case set suffices
# here; the native scanner checks both cases on the raw bytes).
GAP_CHARS = b"-?.NOX"

# Characters treated as gaps for per-query valid ranges: the reference checks
# '-' only (src/util/Range.hpp:34-49).
RANGE_GAP = ord("-")


@dataclass
class Sequence:
    """One (possibly merged-duplicate) aligned sequence."""
    headers: list[str]
    sequence: str

    @property
    def header(self) -> str:
        return self.headers[0]

    def merge(self, other: "Sequence"):
        self.headers.extend(other.headers)


@dataclass
class MSA:
    sequences: list[Sequence] = field(default_factory=list)
    num_sites: int = 0

    def __len__(self):
        return len(self.sequences)

    def __getitem__(self, i) -> Sequence:
        return self.sequences[i]

    def __iter__(self) -> Iterator[Sequence]:
        return iter(self.sequences)

    def append(self, header: str, seq: str):
        if self.num_sites and len(seq) != self.num_sites:
            raise ValueError(
                f"sequence {header!r} length {len(seq)} != MSA width {self.num_sites}")
        self.num_sites = self.num_sites or len(seq)
        self.sequences.append(Sequence([header], seq))


def is_gzipped(path: str) -> bool:
    with open(path, "rb") as f:
        return f.read(2) == b"\x1f\x8b"


def open_seqfile(path: str, mode: str = "rb"):
    """Open a sequence file, transparently decompressing gzip (the
    reference reads gzipped fasta via genesis' input streams)."""
    if is_gzipped(path):
        import gzip
        return gzip.open(path, mode)
    return open(path, mode)


def fasta_record_offset(path: str, skip: int) -> int:
    """Byte offset of the ``skip``-th FASTA record, found by a raw scan for
    line-initial '>' — no per-record parsing, so a rank's shard seek is
    O(bytes scanned) with C-speed memchr instead of O(records parsed)
    (reference seeks too: src/seq/MSA_Stream.cpp:49-57)."""
    if skip <= 0:
        return 0
    seen = 0
    offset = 0
    at_line_start = True
    with open(path, "rb") as f:
        while True:
            block = f.read(1 << 20)
            if not block:
                return offset + len(block)
            pos = 0
            if at_line_start and block[:1] == b">":
                seen += 1
                if seen > skip:
                    return offset
                pos = 1
            while True:
                i = block.find(b"\n>", pos)
                if i < 0:
                    break
                seen += 1
                if seen > skip:
                    return offset + i + 1
                pos = i + 2
            at_line_start = block.endswith(b"\n")
            offset += len(block)


def iter_fasta(path: str, start_offset: int = 0) -> Iterator[tuple[str, str]]:
    """Yield (label, uppercased sequence) from a FASTA file."""
    label = None
    chunks: list[str] = []
    with open_seqfile(path, "rb") as f:
        if start_offset:
            f.seek(start_offset)
        for raw in f:
            line = raw.strip()
            if not line:
                continue
            if line.startswith(b">"):
                if label is not None:
                    yield label, "".join(chunks).upper()
                label = line[1:].decode().strip()
                chunks = []
            else:
                if label is None:
                    raise ValueError(f"{path}: sequence data before first '>'")
                chunks.append(line.decode())
    if label is not None:
        yield label, "".join(chunks).upper()


def iter_phylip(path: str) -> Iterator[tuple[str, str]]:
    """Yield (label, sequence) from sequential or interleaved phylip
    (reference analog: src/util/split.hpp read_any_seqfile)."""
    with io.TextIOWrapper(open_seqfile(path, "rb")) as f:
        header = f.readline().split()
        if len(header) < 2:
            raise ValueError(f"{path}: not a phylip file")
        n_seqs, n_sites = int(header[0]), int(header[1])
        labels: list[str] = []
        seqs: list[list[str]] = []
        # first block: labels + sequence starts
        read = 0
        while read < n_seqs:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: truncated phylip file")
            line = line.strip()
            if not line:
                continue
            parts = line.split(None, 1)
            labels.append(parts[0])
            seqs.append([parts[1].replace(" ", "")] if len(parts) > 1 else [])
            read += 1
        # subsequent blocks (interleaved)
        idx = 0
        for line in f:
            line = line.strip()
            if not line:
                idx = 0
                continue
            seqs[idx].append(line.replace(" ", ""))
            idx = (idx + 1) % n_seqs
        for label, parts in zip(labels, seqs):
            seq = "".join(parts).upper()
            if len(seq) != n_sites:
                raise ValueError(
                    f"{path}: sequence {label!r} has {len(seq)} sites, expected {n_sites}")
            yield label, seq


def iter_any_seqfile(path: str) -> Iterator[tuple[str, str]]:
    with open_seqfile(path, "rb") as f:
        first = f.read(1)
    if first == b">":
        return iter_fasta(path)
    return iter_phylip(path)


@dataclass
class MSAInfo:
    """Size + all-gap column mask info from one prepass over a file
    (reference: src/seq/MSA_Info.hpp). ``gap_mask[i]`` is True where *every*
    sequence has a gap at site i."""
    path: str
    sites: int
    sequences: int
    gap_mask: np.ndarray  # bool [sites]

    @property
    def gap_count(self) -> int:
        return int(self.gap_mask.sum())

    @staticmethod
    def or_mask(lhs: "MSAInfo", rhs: "MSAInfo") -> np.ndarray:
        if lhs.sites != rhs.sites:
            raise ValueError(
                f"MSA files have unequal site width: {lhs.sites} vs. {rhs.sites}")
        mask = lhs.gap_mask | rhs.gap_mask
        lhs.gap_mask = rhs.gap_mask = mask
        return mask


def gap_sites(seq: str) -> np.ndarray:
    arr = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
    mask = np.zeros(len(arr), dtype=bool)
    for g in GAP_CHARS:
        mask |= arr == g
    return mask


def make_msa_info(path: str) -> MSAInfo:
    """One pass over a sequence file: count, width check, all-gap mask.
    Understands bfast files as well (dispatches on magic)."""
    from epa_ng_tpu.io import bfast
    if bfast.is_bfast(path):
        return bfast.get_info(path)
    if not is_gzipped(path):
        # native mmap scanner (returns None for non-fasta/unavailable)
        from epa_ng_tpu.io.native import native_info
        got = native_info(path)
        if got is not None:
            n_seqs, n_sites, mask = got
            return MSAInfo(path=path, sites=n_sites, sequences=n_seqs,
                           gap_mask=mask)
    sites = 0
    count = 0
    mask: Optional[np.ndarray] = None
    for label, seq in iter_any_seqfile(path):
        if sites and len(seq) != sites:
            raise ValueError(
                f"{path} does not contain equal size sequences! "
                f"First offending sequence: {label}")
        sites = sites or len(seq)
        count += 1
        cur = gap_sites(seq)
        mask = cur if mask is None else (mask & cur)
    if mask is None:
        mask = np.zeros(0, dtype=bool)
    return MSAInfo(path=path, sites=sites, sequences=count, gap_mask=mask)


def subset_sequence(seq: str, mask: np.ndarray) -> str:
    """Strip masked (True) columns from a sequence."""
    if len(seq) != len(mask):
        raise ValueError("mask and seq incompatible")
    arr = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
    return arr[~mask].tobytes().decode("ascii")


def build_msa_from_file(path: str, info: MSAInfo, premask: bool) -> MSA:
    """Load a whole alignment, optionally stripping premasked columns."""
    msa = MSA()
    mask = info.gap_mask if premask and info.gap_count else None
    for label, seq in iter_any_seqfile(path):
        if mask is not None:
            seq = subset_sequence(seq, mask)
        msa.append(label, seq)
    return msa


class MSAStream:
    """Chunked streaming reader with optional premasking and shard skip.

    Analog of the reference's MSA_Stream (src/seq/MSA_Stream.cpp): yields MSA
    chunks of at most ``chunk_size`` sequences; under multi-host sharding the
    reader skips to this host's contiguous shard (``local_seq_package``
    arithmetic, src/net/epa_mpi_util.cpp:10-30).
    """

    def __init__(self, path: str, info: MSAInfo, premask: bool = True,
                 split: bool = False, process_index: int = 0,
                 process_count: int = 1, shard: tuple | None = None):
        self._info = info
        self._mask = info.gap_mask if premask and info.gap_count else None
        self._iter = iter_any_seqfile(path)
        self._local_offset = 0
        self._remaining = info.sequences
        if shard is not None or (split and process_count > 1):
            if shard is not None:
                offset, count = shard
            else:
                total = info.sequences
                base = total // process_count
                rem = total % process_count
                offset = process_index * base + min(process_index, rem)
                count = base + (1 if process_index < rem else 0)
            with open(path, "rb") as f:
                plain_fasta = f.read(1) == b">" and not is_gzipped(path)
            if plain_fasta:
                # O(shard-start bytes) raw scan, no record parsing
                byte_off = fasta_record_offset(path, offset)
                self._iter = iter_fasta(path, start_offset=byte_off)
            else:
                for _ in range(offset):
                    next(self._iter, None)
            self._local_offset = offset
            self._remaining = count

    @property
    def local_seq_offset(self) -> int:
        return self._local_offset

    def read_next(self, chunk_size: int) -> MSA:
        msa = MSA()
        while len(msa) < chunk_size and self._remaining > 0:
            item = next(self._iter, None)
            if item is None:
                self._remaining = 0
                break
            label, seq = item
            if self._mask is not None:
                seq = subset_sequence(seq, self._mask)
            msa.append(label, seq)
            self._remaining -= 1
        return msa


def make_msa_reader(path: str, info: MSAInfo, premask: bool, split: bool,
                    process_index: int = 0, process_count: int = 1,
                    shard: tuple | None = None):
    """Factory: bfast random-access reader if the file is bfast, the native
    mmap scanner for plain fasta, else the python streaming reader
    (reference: src/io/msa_reader.hpp:15-26). ``shard`` = explicit
    (offset, count) overriding the even process split — the CLI's
    --adaptive-split passes rate-proportional shares here
    (parallel.schedule.proportional_shares)."""
    from epa_ng_tpu.io import bfast
    if bfast.is_bfast(path):
        return bfast.BfastReader(path, info, premask, split,
                                 process_index, process_count, shard=shard)
    if not is_gzipped(path):
        from epa_ng_tpu.io.native import NativeMSAStream, get_lib
        with open(path, "rb") as f:
            first = f.read(1)
        if first == b">" and get_lib() is not None:
            try:
                return NativeMSAStream(path, info, premask, split,
                                       process_index, process_count,
                                       shard=shard)
            except Exception as e:
                import logging
                logging.getLogger("epa_ng_tpu").debug(
                    "native reader unavailable (%s); python fallback", e)
    return MSAStream(path, info, premask, split, process_index,
                     process_count, shard=shard)


def find_collapse_equal_sequences(msa: MSA) -> MSA:
    """Collapse duplicate sequences into one entry holding all headers
    (reference: src/set_manipulators.cpp:208-226)."""
    seen: dict[str, Sequence] = {}
    out = MSA(num_sites=msa.num_sites)
    for s in msa:
        prev = seen.get(s.sequence)
        if prev is None:
            seen[s.sequence] = s
            out.sequences.append(s)
        else:
            prev.headers.extend(s.headers)
    return out
