"""Logging setup: stdout + per-process epa_info.log file, mirroring the
reference's genesis-based logging (src/main.cpp:53-64, 308-320)."""

from __future__ import annotations

import logging
import os
import sys


def setup_logging(outdir: str, verbose: bool = False, redo: bool = False,
                  process_index: int = 0, process_count: int = 1) -> str:
    log = logging.getLogger("epa_ng_tpu")
    log.setLevel(logging.DEBUG if verbose else logging.INFO)
    log.handlers.clear()

    if process_count > 1:
        log_file = os.path.join(outdir, f"{process_index}.epa_info.log")
    else:
        log_file = os.path.join(outdir, "epa_info.log")

    if not redo and os.path.exists(log_file):
        raise RuntimeError(
            f"{log_file} already exists! To overwrite existing output files, "
            "rerun with --redo")

    fmt = logging.Formatter("%(message)s")
    fh = logging.FileHandler(log_file, mode="w")
    fh.setFormatter(fmt)
    log.addHandler(fh)
    if process_index == 0:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        log.addHandler(sh)
    return log_file
