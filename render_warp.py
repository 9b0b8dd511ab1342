#!/usr/bin/env python
"""Entry point: animation / shape interpolation (parity with reference render_warp.py)."""
from avatarcraft_tpu.cli.render_warp_cli import main

if __name__ == "__main__":
    main()
