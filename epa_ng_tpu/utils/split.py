"""--split preprocessing: separate combined ref+query alignments.

Given a reference MSA and one or more combined ref+query alignments, emit
``query.fasta`` (queries only) and ``reference.fasta`` (the reference rows
as they appear in the combined alignment) — mirrors reference
src/util/split.hpp:62-110.
"""

from __future__ import annotations

import logging
import os

from epa_ng_tpu.io.fasta import iter_any_seqfile

log = logging.getLogger("epa_ng_tpu")


def write_fasta_entry(f, label: str, seq: str, width: int = 80):
    f.write(f">{label}\n")
    for i in range(0, len(seq), width):
        f.write(seq[i:i + width] + "\n")


def split(ref_msa: str, query_files: list[str], outdir: str = ""):
    ref_labels = {label for label, _ in iter_any_seqfile(ref_msa)}
    if not ref_labels:
        raise ValueError(f"no sequences found in {ref_msa}")

    out_query = os.path.join(outdir, "query.fasta")
    out_ref = os.path.join(outdir, "reference.fasta")

    qry_width = 0
    first = True
    with open(out_query, "w") as qf:
        for qry_file in query_files:
            entries = list(iter_any_seqfile(qry_file))
            if not entries:
                raise ValueError(f"no sequences found in {qry_file}")
            cur_width = len(entries[0][1])
            if qry_width and cur_width != qry_width:
                raise ValueError(
                    f"Query file '{qry_file}' appears to have an alignment "
                    "width that differs from previous query alignments. "
                    "Aborting!")
            qry_width = cur_width

            if first:
                # reference rows as found in the combined file
                found = {}
                for label, seq in entries:
                    if label in ref_labels:
                        found[label] = seq
                missing = ref_labels - set(found)
                if missing:
                    raise ValueError(
                        "Could not find all references in the query file to "
                        "produce an appropriate reference.fasta!")
                with open(out_ref, "w") as rf:
                    for label, seq in found.items():
                        write_fasta_entry(rf, label, seq)
                first = False

            for label, seq in entries:
                if label not in ref_labels:
                    write_fasta_entry(qf, label, seq)
    return out_query, out_ref
