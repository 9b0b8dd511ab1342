#!/usr/bin/env python
"""Entry point: SDS avatar creation (parity with reference stylize.py)."""
from avatarcraft_tpu.cli.stylize_cli import main

if __name__ == "__main__":
    main()
