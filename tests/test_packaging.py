"""Packaging surface: the pip entry points and repo-root shims stay wired.

The implementations live in bist_tpu/cli/ (one module per reference pipeline
stage); repo-root scripts are shims kept for the reference's flat CLI layout
(reference scripts/exec.sh invokes `python train.py ...` etc.), and
pyproject.toml installs the same mains as console scripts.  This test pins
all three surfaces to each other so a rename can't silently orphan one.
"""

import importlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ENTRY_MODULES = (
    "train", "generate", "evaluate", "serve", "extract_features",
    "train_tgif", "generate_result_video",
)


def _console_script_targets():
    """Parse [project.scripts] out of pyproject.toml (no tomllib dependency
    on exact formatting — the file is ours)."""
    try:
        import tomllib
    except ImportError:  # pragma: no cover — py<3.11
        import tomli as tomllib
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)["project"]["scripts"]


def test_cli_modules_expose_main():
    for name in ENTRY_MODULES:
        mod = importlib.import_module(f"bist_tpu.cli.{name}")
        assert callable(getattr(mod, "main")), name


def test_root_shims_reexport_package_main():
    for name in ENTRY_MODULES:
        shim = importlib.import_module(name)
        impl = importlib.import_module(f"bist_tpu.cli.{name}")
        assert shim.main is impl.main, name


def test_version_in_sync():
    try:
        import tomllib
    except ImportError:  # pragma: no cover — py<3.11
        import tomli as tomllib
    import bist_tpu

    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        assert tomllib.load(f)["project"]["version"] == bist_tpu.__version__


def test_console_scripts_resolve():
    targets = _console_script_targets()
    assert len(targets) == len(ENTRY_MODULES)
    for script, target in targets.items():
        mod_name, _, attr = target.partition(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, attr)), script
        assert mod_name.startswith("bist_tpu.cli."), script


def test_lazy_cli_package_import_is_cheap():
    # `import bist_tpu.cli` must not drag in jax/train machinery; modules
    # load on attribute access (bist_tpu/cli/__init__.py.__getattr__)
    import subprocess

    src = ("import sys; import bist_tpu.cli; "
           "assert 'bist_tpu.cli.train' not in sys.modules; "
           "bist_tpu.cli.train; "
           "assert 'bist_tpu.cli.train' in sys.modules; print('ok')")
    r = subprocess.run([sys.executable, "-c", src], cwd=REPO,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0 and "ok" in r.stdout, r.stderr[-2000:]
