#!/usr/bin/env python
"""Repo-root shim for bist_tpu.cli.evaluate — keeps the reference's flat CLI
layout (`python evaluate.py ...`) working; the implementation lives in the
package and is also installed as a console script (see pyproject.toml)."""
from bist_tpu.cli.evaluate import *        # noqa: F401,F403
from bist_tpu.cli.evaluate import main     # noqa: F401

if __name__ == "__main__":
    main()
