"""Model-file parsers: RAxML8 ``-f e`` info files, raxml-ng ``.bestModel``,
IQ-TREE report files -> raxml-ng descriptor string.

Mirrors reference src/util/parse_model.hpp:13-269, including its literal
string extraction (values are copied verbatim into the descriptor, preserving
the original formatting).
"""

from __future__ import annotations

DNA_CHARS = "ACGT"
AA_CHARS = "ARNDCQEGHILKMFPSTWYV"


class ModelFileError(ValueError):
    pass


def _parse(full: str, qry: str, pos: int) -> tuple[str, int]:
    i = full.find(qry, pos)
    if i < 0:
        raise ModelFileError(f"Couldn't parse model file! (can't find {qry!r}!)")
    i += len(qry)
    end = full.find("\n", i)
    if end < 0:
        raise ModelFileError("couldn't find terminating newline")
    return full[i:end], end


def _rest_has(full: str, qry: str, pos: int) -> bool:
    return full.find(qry, pos) >= 0


def _from_raxml8(full: str) -> str:
    pos = 0
    dtype, pos = _parse(full, "DataType: ", pos)
    dna = dtype == "DNA"
    sub_mat, pos = _parse(full, "Substitution Matrix: ", pos)
    if not dna and sub_mat == "GTR":
        sub_mat = "PROTGTR"
    out = [sub_mat]

    alpha = ""
    if _rest_has(full, "alpha: ", pos):
        v, pos = _parse(full, "alpha: ", pos)
        alpha = "+G4{" + v + "}"
    p_inv = ""
    if _rest_has(full, "invar: ", pos):
        v, pos = _parse(full, "invar: ", pos)
        p_inv = "+IU{" + v + "}"

    chars = DNA_CHARS if dna else AA_CHARS
    rates = []
    for i in range(len(chars) - 1):
        for k in range(i + 1, len(chars)):
            v, pos = _parse(full, f"rate {chars[i]} <-> {chars[k]}: ", pos)
            rates.append(v)
    out.append("{" + "/".join(rates) + "}")

    freqs = []
    for c in chars:
        v, pos = _parse(full, f"freq pi({c}): ", pos)
        freqs.append(v)
    out.append("+FU{" + "/".join(freqs) + "}")

    out.append(p_inv)
    out.append(alpha)
    return "".join(out)


def _from_raxml_ng(full: str) -> str:
    line = full.split("\n", 1)[0]
    parts = line.split(",")
    if len(parts) <= 1:
        raise ModelFileError("Model string in provided file seems wrong.")
    return parts[0]


def _from_iqtree(full: str) -> str:
    pos = 0
    model_line, pos = _parse(full, "Model of substitution: ", pos)
    sub_mat = model_line.split("+")[0]
    dna = sub_mat == "GTR"
    out = [sub_mat]
    chars = DNA_CHARS if dna else AA_CHARS

    rates = []
    for i in range(len(chars) - 1):
        for k in range(i + 1, len(chars)):
            v, pos = _parse(full, f"{chars[i]}-{chars[k]}: ", pos)
            rates.append(v)
    out.append("{" + "/".join(rates) + "}")

    freqs = []
    for c in chars:
        v, pos = _parse(full, f"pi({c}) = ", pos)
        freqs.append(v)
    out.append("+FU{" + "/".join(freqs) + "}")

    gamma = _rest_has(full, "Gamma with ", pos)
    gamma_cats = ""
    if gamma:
        tail, pos = _parse(full, "Gamma with ", pos)
        i = tail.find(" categories")
        if i <= 0:
            raise ModelFileError("Couldn't parse model file! "
                                 "(can't find ' categories'!)")
        gamma_cats = tail[:i]

    if _rest_has(full, "Proportion of invariable sites: ", pos):
        v, pos = _parse(full, "Proportion of invariable sites: ", pos)
        out.append("+IU{" + v + "}")
    if gamma:
        v, pos = _parse(full, "Gamma shape alpha: ", pos)
        out.append("+G" + gamma_cats + "{" + v + "}")
    return "".join(out)


def parse_model_file(path: str) -> str:
    """Auto-detect the model file type and return a descriptor string
    (reference: src/util/parse_model.hpp:229-269)."""
    with open(path) as f:
        full = f.read()
    first_line = full.split("\n", 1)[0]
    if first_line.startswith("IQ-TREE "):
        return _from_iqtree(full)
    if "This is RAxML version 8." in full:
        return _from_raxml8(full)
    return _from_raxml_ng(full)
