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


def _build_state_mask_table(bits: dict, num_states: int) -> np.ndarray:
    """ASCII (256) -> state bitmask; 0 means invalid character."""
    table = np.zeros(256, dtype=np.uint32)
    for ch, mask in bits.items():
        table[ord(ch)] = mask
        table[ord(ch.lower())] = mask
    return table


DNA_STATE_MASK = _build_state_mask_table(_DNA_BITS, 4)
AA_STATE_MASK = _build_state_mask_table(_AA_BITS, 20)


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

INVALID_COL = 255


def state_mask_table(num_states: int) -> np.ndarray:
    if num_states == 4:
        return DNA_STATE_MASK
    if num_states == 20:
        return AA_STATE_MASK
    raise ValueError(f"unsupported number of states: {num_states}")


def lookup_chars(num_states: int) -> str:
    return NT_LOOKUP_CHARS if num_states == 4 else AA_LOOKUP_CHARS


def lookup_col_table(num_states: int) -> np.ndarray:
    if num_states == 4:
        return NT_LOOKUP_COL
    if num_states == 20:
        return AA_LOOKUP_COL
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
