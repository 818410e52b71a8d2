"""Import-rot guard: every script in scripts/ must import cleanly.

The profiler scripts are TPU measurement tools that can't execute here,
but refactors in the package they profile must not silently break them —
an import failure is the common rot mode (moved symbol, renamed module).
All scripts keep their work under main()/__main__, so importing is safe
on the CPU test mesh.
"""

import importlib
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]
SCRIPTS = sorted(p.stem for p in (ROOT / "scripts").glob("*.py"))


@pytest.mark.parametrize("name", SCRIPTS)
def test_script_imports(name):
    sys.path.insert(0, str(ROOT / "scripts"))
    try:
        mod = importlib.import_module(name)
        assert hasattr(mod, "main") or hasattr(mod, "run_ab") or hasattr(
            mod, "timeit"
        ), f"{name} has no driveable entry point"
    finally:
        sys.path.remove(str(ROOT / "scripts"))
