"""bfast: random-access binary FASTA (byte-compatible with the reference).

Layout (reference: src/io/Binary_Fasta.hpp:38-96, src/io/encoding.hpp):

    <magic "BFAST\\0" (6 bytes)>
    <num_sequences: u64le>
    <mask: length-prefixed ASCII '0'/'1' string, bit 0 first>
    num_sequences x <seq_id: u64le> <byte_offset: u64le>
    per sequence:
        <label: length-prefixed string>
        <decoded_length: u64le>
        <4-bit packed sequence, 2 chars/byte, first char in high nibble,
         odd length padded with '-' (code 0)>

4-bit code = index into "-TGKCYSBAWRDMHVN" (the ACGT bitmask with A high,
reference: src/util/maps.hpp:5-26). DNA only.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

from epa_ng_tpu.models.charmaps import NT_LOOKUP_CHARS

# The reference's MAGIC is the 7-byte char array {'B','F','A','S','T','\0','\0'}
# (array_size of the literal "BFAST\0" includes the implicit terminator,
# reference: src/io/Binary_Fasta.hpp:21-22).
MAGIC = b"BFAST\x00\x00"
_MAGIC_PREFIX = b"BFAST\x00"

# char -> 4-bit code table (uppercase + lowercase); 255 = invalid
_ENC = np.full(256, 255, dtype=np.uint8)
for _i, _c in enumerate(NT_LOOKUP_CHARS):
    _ENC[ord(_c)] = _i
    _ENC[ord(_c.lower())] = _i
_DEC = np.frombuffer(NT_LOOKUP_CHARS.encode(), dtype=np.uint8)


def is_bfast(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            return f.read(len(_MAGIC_PREFIX)) == _MAGIC_PREFIX
    except OSError:
        return False


def pack_fourbit(seq: str) -> bytes:
    arr = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
    codes = _ENC[arr]
    if (codes == 255).any():
        bad = chr(arr[codes == 255][0])
        raise ValueError(
            f"AA DATA NOT SUPPORTED for conversion to bfast! Offending char: {bad}")
    if len(codes) % 2:
        codes = np.concatenate([codes, np.zeros(1, dtype=np.uint8)])
    packed = (codes[0::2] << 4) | codes[1::2]
    return packed.astype(np.uint8).tobytes()


def unpack_fourbit(data: bytes, n: int) -> str:
    packed = np.frombuffer(data, dtype=np.uint8)
    codes = np.empty(len(packed) * 2, dtype=np.uint8)
    codes[0::2] = packed >> 4
    codes[1::2] = packed & 0x0F
    return _DEC[codes[:n]].tobytes().decode("ascii")


def _put_string(out, s: bytes):
    out.write(struct.pack("<Q", len(s)))
    out.write(s)


def _get_u64(f) -> int:
    return struct.unpack("<Q", f.read(8))[0]


def _get_string(f) -> bytes:
    n = _get_u64(f)
    return f.read(n)


def _header_size(num_sequences: int, mask_size: int) -> int:
    return (len(MAGIC) + 8 + num_sequences * 16 + mask_size + 8)


def write_bfast(path: str, entries, mask: np.ndarray):
    """entries: iterable of (label: str, seq: str); mask: bool [sites]."""
    entries = list(entries)
    num = len(entries)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<Q", num))
        mask_str = b"".join(b"1" if b else b"0" for b in mask)
        _put_string(f, mask_str)
        offset = _header_size(num, len(mask))
        for i, (label, seq) in enumerate(entries):
            entry_size = (len(seq) + 1) // 2 + len(label)
            f.write(struct.pack("<QQ", i, offset))
            offset += 16 + entry_size
        for label, seq in entries:
            _put_string(f, label.encode())
            f.write(struct.pack("<Q", len(seq)))
            f.write(pack_fourbit(seq))


def fasta_to_bfast(fasta_path: str, out_dir: str) -> str:
    """Convert a FASTA file to bfast (reference: Binary_Fasta.hpp:214-246)."""
    import os
    from epa_ng_tpu.io import fasta as fio
    out_path = os.path.join(out_dir, os.path.basename(fasta_path) + ".bfast")
    info = fio.make_msa_info(fasta_path)
    write_bfast(out_path, fio.iter_fasta(fasta_path), info.gap_mask)
    return out_path


def _read_header(f):
    """Read the header; supports the current (with gap mask) and the legacy
    (no mask section) layout, distinguished by whether the first table entry's
    byte offset is consistent with the assumed header size."""
    magic = f.read(len(MAGIC))
    if magic[:len(_MAGIC_PREFIX)] != _MAGIC_PREFIX:
        raise ValueError("File is not a bfast (Binary_Fasta) file")
    num = _get_u64(f)

    table_pos = f.tell()
    # hypothesis A: current format with length-prefixed ASCII mask
    mask_len = _get_u64(f)
    mask_str = f.read(mask_len)
    ok_a = len(mask_str) == mask_len
    if ok_a:
        first_id = _get_u64(f)
        first_off = _get_u64(f)
        ok_a = (first_id == 0
                and first_off == _header_size(num, mask_len))
    if ok_a:
        mask = np.frombuffer(mask_str, dtype=np.uint8) == ord("1")
        f.seek(table_pos + 8 + mask_len)
    else:
        # hypothesis B: legacy format, no mask
        f.seek(table_pos)
        mask = np.zeros(0, dtype=bool)

    offsets = np.zeros(num, dtype=np.uint64)
    for _ in range(num):
        idx = _get_u64(f)
        offsets[idx] = _get_u64(f)
    return offsets, mask


def get_info(path: str):
    from epa_ng_tpu.io.fasta import MSAInfo
    with open(path, "rb") as f:
        offsets, mask = _read_header(f)
    return MSAInfo(path=path, sites=len(mask), sequences=len(offsets),
                   gap_mask=mask.copy())


def load(path: str, premask: bool = False):
    from epa_ng_tpu.io.fasta import MSA, subset_sequence
    msa = MSA()
    with open(path, "rb") as f:
        offsets, mask = _read_header(f)
        use_mask = premask and mask.any()
        for _ in range(len(offsets)):
            label = _get_string(f).decode()
            n = _get_u64(f)
            seq = unpack_fourbit(f.read((n + 1) // 2), n)
            if use_mask:
                seq = subset_sequence(seq, mask)
            msa.append(label, seq)
    return msa


class BfastReader:
    """Chunked random-access reader; under multi-host sharding seeks straight
    to this host's shard (reference: Binary_Fasta.hpp:252-310)."""

    def __init__(self, path: str, info, premask: bool = False,
                 split: bool = False, process_index: int = 0,
                 process_count: int = 1, shard: tuple | None = None):
        self._f = open(path, "rb")
        self._offsets, mask = _read_header(self._f)
        self._mask: Optional[np.ndarray] = mask if premask and mask.any() else None
        total = len(self._offsets)
        self._local_offset = 0
        self._max_read = total
        if shard is not None:
            self._local_offset, self._max_read = shard
            if self._max_read and self._local_offset < total:
                self._f.seek(int(self._offsets[self._local_offset]))
        elif split and process_count > 1:
            base = total // process_count
            rem = total % process_count
            self._local_offset = process_index * base + min(process_index, rem)
            self._max_read = base + (1 if process_index < rem else 0)
            self._f.seek(int(self._offsets[self._local_offset]))
        self._num_read = 0

    @property
    def local_seq_offset(self) -> int:
        return self._local_offset

    def read_next(self, chunk_size: int):
        from epa_ng_tpu.io.fasta import MSA, subset_sequence
        msa = MSA()
        to_read = min(chunk_size, self._max_read - self._num_read)
        for _ in range(to_read):
            label = _get_string(self._f).decode()
            n = _get_u64(self._f)
            seq = unpack_fourbit(self._f.read((n + 1) // 2), n)
            if self._mask is not None:
                seq = subset_sequence(seq, self._mask)
            msa.append(label, seq)
        self._num_read += len(msa)
        return msa

    def read_next_encoded(self, chunk_size: int, num_states: int = 4):
        """One chunk as an EncodedChunk DIRECTLY from the 4-bit payload:
        the bfast code (index into "-TGKCYSBAWRDMHVN") IS the engine's
        DNA lookup-column index, so decode skips text entirely — one bulk
        file read, one vectorized nibble unpack into the [Q, S] codes
        matrix (the reference's rationale for the format: bfast
        "increases parallel efficiency", README.md:215-216). Returns None
        at EOF."""
        from epa_ng_tpu.core.chunk import EncodedChunk, ranges_from_nongap
        if num_states != 4:
            raise ValueError("bfast files hold DNA (4-state) data only")
        to_read = min(chunk_size, self._max_read - self._num_read)
        if to_read <= 0:
            return None
        i0 = self._local_offset + self._num_read
        start = int(self._offsets[i0])
        if i0 + to_read < len(self._offsets):
            end = int(self._offsets[i0 + to_read])
        else:
            import os
            end = os.fstat(self._f.fileno()).st_size
        self._f.seek(start)
        buf = self._f.read(end - start)
        b = np.frombuffer(buf, dtype=np.uint8)

        rel = (self._offsets[i0:i0 + to_read].astype(np.int64) - start)
        headers = []
        payload_starts = np.empty(to_read, dtype=np.int64)
        n_sites = -1
        for i in range(to_read):
            r = int(rel[i])
            ll = int.from_bytes(buf[r:r + 8], "little")
            headers.append([buf[r + 8:r + 8 + ll].decode()])
            n = int.from_bytes(buf[r + 8 + ll:r + 16 + ll], "little")
            if n_sites < 0:
                n_sites = n
            elif n != n_sites:
                raise ValueError(
                    "Query sequence length not same as reference alignment!")
            payload_starts[i] = r + 16 + ll
        pl = (n_sites + 1) // 2
        packed = b[payload_starts[:, None] + np.arange(pl)[None, :]]
        codes = np.empty((to_read, 2 * pl), dtype=np.uint8)
        codes[:, 0::2] = packed >> 4
        codes[:, 1::2] = packed & 0x0F
        codes = codes[:, :n_sites]
        if self._mask is not None:
            codes = np.ascontiguousarray(codes[:, ~self._mask])
        self._num_read += to_read
        # gap code 0 decodes to '-' (and nothing else does), so the
        # valid-range rule matches the text path's literal-'-' trim
        return EncodedChunk(headers=headers, codes=codes,
                            ranges=ranges_from_nongap(codes != 0))
