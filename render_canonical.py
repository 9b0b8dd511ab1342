#!/usr/bin/env python
"""Entry point: 360-degree canonical avatar renders (parity with reference render_canonical.py)."""
from avatarcraft_tpu.cli.render_canonical_cli import main

if __name__ == "__main__":
    main()
