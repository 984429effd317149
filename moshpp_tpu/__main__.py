"""`python -m moshpp_tpu` entry point."""

import sys

from moshpp_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
