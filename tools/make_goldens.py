"""Regenerate the golden-jplace regression corpus (tests/golden/).

Run deliberately after an INTENDED output-format change and review the
diff:  JAX_PLATFORMS=cpu python tools/make_goldens.py

Uses the same configurations as tests/test_golden_jplace.py so the test
and the generator can never drift apart.
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "1")


def main():
    from tests.test_golden_jplace import CONFIGS, GOLDEN_DIR, run_config
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in CONFIGS:
        tmp = tempfile.mkdtemp(prefix=f"golden_{name}_")
        try:
            out = run_config(name, tmp)
            dest = os.path.join(GOLDEN_DIR, f"{name}.jplace")
            shutil.copyfile(out, dest)
            print(f"wrote {dest}")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
