"""``python -m tpusparse`` -> the CLI (check/bench/headline/profile/...)."""

import sys

from tpusparse.cli import main

if __name__ == "__main__":
    sys.exit(main())
