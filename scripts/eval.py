#!/usr/bin/env python
"""Thin wrapper: python scripts/eval.py ... == python -m xiaoicesing_io_tpu.cli.main eval ..."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from xiaoicesing_io_tpu.cli.main import cli

if __name__ == "__main__":
    sys.argv.insert(1, "eval")
    cli()
