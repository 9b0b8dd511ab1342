#!/usr/bin/env python
"""Entry point: canonical NeuS pretraining (parity with reference reconstruct.py)."""
from avatarcraft_tpu.cli.reconstruct_cli import main

if __name__ == "__main__":
    main()
