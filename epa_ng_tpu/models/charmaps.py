"""Character maps: sequence characters -> state sets / lookup columns.

Three related encodings exist, mirroring the reference's layering:

1. **State masks** (`*_STATE_MASK`): ASCII char -> bitmask over model states
   (bit i set => state i possible). This is the analog of libpll's
   ``pll_map_nt`` / ``pll_map_aa`` used to build tip CLVs (multi-hot rows).
   DNA state order is ACGT, protein order is ARNDCQEGHILKMFPSTWYV (the PAML /
   libpll convention, also the order model files list rates/freqs in;
   reference: src/util/parse_model.hpp:89).

2. **Lookup columns** (`*_LOOKUP_*`): the preplacement lookup table has one
   column per *distinct tip-CLV pattern*; input characters are normalized onto
   those columns (case folding, RNA U->T, gap variants). Mirrors
   reference src/core/Lookup_Store.hpp:40-68 and src/util/maps.hpp.

3. **4-bit codes** (`FOURBIT_*`): the bfast binary FASTA encoding where the
   code is the bitmask of ACGT with A as the high bit
   (reference: src/util/maps.hpp:5-26).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# DNA
# ---------------------------------------------------------------------------

DNA_STATES = "ACGT"

# char -> (bit0=A, bit1=C, bit2=G, bit3=T), libpll pll_map_nt convention
_DNA_BITS = {
    "A": 0b0001, "C": 0b0010, "G": 0b0100, "T": 0b1000, "U": 0b1000,
    "R": 0b0101, "Y": 0b1010, "S": 0b0110, "W": 0b1001, "K": 0b1100,
    "M": 0b0011, "B": 0b1110, "D": 0b1101, "H": 0b1011, "V": 0b0111,
    "N": 0b1111, "-": 0b1111, "?": 0b1111, "X": 0b1111, "O": 0b1111,
    ".": 0b1111, "*": 0b1111, "~": 0b1111,
}

# The 16 lookup columns, indexed by the bfast 4-bit code (A high bit):
# reference src/util/maps.hpp NT_MAP
NT_LOOKUP_CHARS = "-TGKCYSBAWRDMHVN"  # index == 4-bit code (ACGT, A=8)

AA_STATES = "ARNDCQEGHILKMFPSTWYV"

_AA_BITS = {}
for _i, _c in enumerate(AA_STATES):
    _AA_BITS[_c] = 1 << _i
_ALL_AA = (1 << 20) - 1
_AA_BITS.update({
    "B": _AA_BITS["N"] | _AA_BITS["D"],
    "Z": _AA_BITS["Q"] | _AA_BITS["E"],
    "J": _AA_BITS["I"] | _AA_BITS["L"],
    "X": _ALL_AA, "-": _ALL_AA, "?": _ALL_AA, "*": _ALL_AA, ".": _ALL_AA,
})

# The 24 lookup columns for amino acids (reference src/util/maps.hpp AA_MAP)
AA_LOOKUP_CHARS = "ACDEFGHIKLMNPQRSTVWY-XBZ"

# ---------------------------------------------------------------------------
# Binary (2-state) data, libpll pll_map_bin convention
# ---------------------------------------------------------------------------

BIN_STATES = "01"

_BIN_BITS = {
    "0": 0b01, "1": 0b10,
    "-": 0b11, "?": 0b11, "*": 0b11, ".": 0b11, "X": 0b11,
}

BIN_LOOKUP_CHARS = "01-"

# ---------------------------------------------------------------------------
# Unphased diploid genotype (10-state) data. State order and character map
# follow the reference's pll_map_diploid10 (src/core/raxml/Model.cpp:36-52):
# bit k = state k with states [AA CC GG TT AC AG CG AT CT GT]; homozygotes
# are the plain bases, heterozygotes the IUPAC two-base ambiguity codes.
# ---------------------------------------------------------------------------

GT_STATES = ("AA", "CC", "GG", "TT", "AC", "AG", "CG", "AT", "CT", "GT")

_ALL_GT = (1 << 10) - 1
_GT_BITS = {
    "A": 1 << 0, "C": 1 << 1, "G": 1 << 2, "T": 1 << 3, "U": 1 << 3,
    "M": 1 << 4,  # A/C het
    "R": 1 << 5,  # A/G het
    "S": 1 << 6,  # C/G het
    "W": 1 << 7,  # A/T het
    "Y": 1 << 8,  # C/T het
    "K": 1 << 9,  # G/T het
    "-": _ALL_GT, "?": _ALL_GT, "N": _ALL_GT, "O": _ALL_GT, "X": _ALL_GT,
}

GT_LOOKUP_CHARS = "ACGTMRSWYK-"


def _build_state_mask_table(bits: dict, num_states: int) -> np.ndarray:
    """ASCII (256) -> state bitmask; 0 means invalid character."""
    table = np.zeros(256, dtype=np.uint32)
    for ch, mask in bits.items():
        table[ord(ch)] = mask
        table[ord(ch.lower())] = mask
    return table


DNA_STATE_MASK = _build_state_mask_table(_DNA_BITS, 4)
AA_STATE_MASK = _build_state_mask_table(_AA_BITS, 20)
BIN_STATE_MASK = _build_state_mask_table(_BIN_BITS, 2)
GT_STATE_MASK = _build_state_mask_table(_GT_BITS, 10)


def _build_lookup_col_table(chars: str, dna: bool) -> np.ndarray:
    """ASCII (256) -> lookup-table column, with the reference's normalization.

    Mirrors Lookup_Store's char_to_posish (reference:
    src/core/Lookup_Store.hpp:40-68): case folding; DNA: U->T column and
    X/O/. -> gap column; '?' -> gap column. One deliberate deviation: for
    amino acids the reference aliases 'X' onto the 'N' (asparagine) column
    (Lookup_Store.hpp:64-65) even though a dedicated all-states 'X' column
    exists; we keep 'X' on its own all-states column, which only affects
    preplacement ranking of AA queries containing 'X'.
    """
    table = np.full(256, 255, dtype=np.uint8)  # 255 = invalid
    for i, ch in enumerate(chars):
        table[ord(ch)] = i
        table[ord(ch.lower())] = i
    gap_col = chars.index("-")
    if dna:
        t_col = chars.index("T")
        for ch in "Uu":
            table[ord(ch)] = t_col
        for ch in "XxOo.":
            table[ord(ch)] = gap_col
    else:
        for ch in ".*":
            table[ord(ch)] = gap_col
    table[ord("?")] = gap_col
    return table


NT_LOOKUP_COL = _build_lookup_col_table(NT_LOOKUP_CHARS, dna=True)
AA_LOOKUP_COL = _build_lookup_col_table(AA_LOOKUP_CHARS, dna=False)


def _extra_lookup_cols(chars: str, bits: dict) -> np.ndarray:
    """Lookup-column table for the BIN/GT alphabets: every char in the
    state-mask dict maps onto its column; all-states chars share the gap
    column; aliases (e.g. U->T) collapse onto the canonical column."""
    table = np.full(256, 255, dtype=np.uint8)
    gap_col = chars.index("-")
    all_states = bits["-"]
    by_mask = {bits[c]: i for i, c in enumerate(chars) if c in bits}
    for ch, mask in bits.items():
        col = gap_col if mask == all_states else by_mask[mask]
        table[ord(ch)] = col
        table[ord(ch.lower())] = col
    return table


BIN_LOOKUP_COL = _extra_lookup_cols(BIN_LOOKUP_CHARS, _BIN_BITS)
GT_LOOKUP_COL = _extra_lookup_cols(GT_LOOKUP_CHARS, _GT_BITS)

INVALID_COL = 255

_STATE_MASKS = {4: DNA_STATE_MASK, 20: AA_STATE_MASK, 2: BIN_STATE_MASK,
                10: GT_STATE_MASK}
_LOOKUP_CHARS = {4: NT_LOOKUP_CHARS, 20: AA_LOOKUP_CHARS,
                 2: BIN_LOOKUP_CHARS, 10: GT_LOOKUP_CHARS}
_LOOKUP_COLS = {4: NT_LOOKUP_COL, 20: AA_LOOKUP_COL, 2: BIN_LOOKUP_COL,
                10: GT_LOOKUP_COL}


def state_mask_table(num_states: int) -> np.ndarray:
    try:
        return _STATE_MASKS[num_states]
    except KeyError:
        raise ValueError(f"unsupported number of states: {num_states}")


def lookup_chars(num_states: int) -> str:
    try:
        return _LOOKUP_CHARS[num_states]
    except KeyError:
        raise ValueError(f"unsupported number of states: {num_states}")


def lookup_col_table(num_states: int) -> np.ndarray:
    try:
        return _LOOKUP_COLS[num_states]
    except KeyError:
        raise ValueError(f"unsupported number of states: {num_states}")


def lookup_tip_clvs(num_states: int) -> np.ndarray:
    """Tip CLV row for every lookup column: [num_cols, num_states] 0/1."""
    chars = lookup_chars(num_states)
    masks = state_mask_table(num_states)
    out = np.zeros((len(chars), num_states), dtype=np.float64)
    for i, ch in enumerate(chars):
        m = int(masks[ord(ch)])
        for s in range(num_states):
            if m >> s & 1:
                out[i, s] = 1.0
    return out


def encode_states(seq: str, num_states: int) -> np.ndarray:
    """Sequence -> per-site state bitmask array (uint32). Raises on invalid."""
    table = state_mask_table(num_states)
    arr = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
    masks = table[arr]
    if (masks == 0).any():
        bad = arr[masks == 0][0]
        raise ValueError(f"invalid character {chr(bad)!r} in sequence")
    return masks


def encode_lookup_cols(seq: str, num_states: int) -> np.ndarray:
    """Sequence -> per-site lookup-column index (uint8). Raises on invalid."""
    table = lookup_col_table(num_states)
    arr = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
    cols = table[arr]
    if (cols == INVALID_COL).any():
        bad = arr[cols == INVALID_COL][0]
        raise ValueError(f"invalid character {chr(bad)!r} in sequence")
    return cols


def mask_to_clv_rows(masks: np.ndarray, num_states: int) -> np.ndarray:
    """Per-site state bitmasks -> multi-hot tip CLV matrix [sites, states]."""
    bits = (masks[:, None] >> np.arange(num_states)[None, :]) & 1
    return bits.astype(np.float64)
