"""`python -m realpdebench_tpu` → CLI (reference realpdebench/__main__.py)."""

import sys

from realpdebench_tpu.cli import main

if __name__ == "__main__":
    main(sys.argv[1:])
