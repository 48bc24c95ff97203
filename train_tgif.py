#!/usr/bin/env python
"""Repo-root shim for bist_tpu.cli.train_tgif — keeps the reference's flat CLI
layout (`python train_tgif.py ...`) working; the implementation lives in the
package and is also installed as a console script (see pyproject.toml)."""
from bist_tpu.cli.train_tgif import *        # noqa: F401,F403
from bist_tpu.cli.train_tgif import main     # noqa: F401

if __name__ == "__main__":
    main()
