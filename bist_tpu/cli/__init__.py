"""Command-line entry points, importable as a package.

Each module mirrors one reference-pipeline stage (reference scripts/exec.sh
stages) and is exposed both ways:

  * repo-root shims (``python train.py ...``) — the reference's flat layout,
    kept for drop-in CLI compatibility;
  * console scripts installed by pyproject.toml (``bist-train ...``) for
    ``pip install``-ed deployments.

Modules are imported lazily — ``import bist_tpu.cli`` stays cheap; pulling a
submodule pays only that stage's import cost (jax etc.).
"""

_ENTRY_MODULES = (
    "train", "generate", "evaluate", "serve", "extract_features",
    "train_tgif", "generate_result_video",
)

__all__ = list(_ENTRY_MODULES) + ["repo_root"]


def repo_root():
    """Best-effort path to a source checkout's repository root.

    Entry points locate repo-level data (e.g. ``dstc7avsd_eval/data``)
    relative to this; in an installed (site-packages) layout those files are
    not shipped, callers fall back to explicit flags.
    """
    import os

    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def __getattr__(name):
    if name in _ENTRY_MODULES:
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
